import sys

from mh_tpu.cli import main

sys.exit(main())
