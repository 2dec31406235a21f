"""Parallelism: device meshes, sharded chain execution, and collectives.

The reference's only inter-unit parallelism is one CUDA block per chain with
zero inter-block communication (``Kernel.cu:949-951``). Here chains are a
sharded mesh axis, and the framework adds the communication layer the
reference lacks: collective acceptance-rate adaptation (psum), parallel
tempering (ppermute replica exchange), and SMC resampling (all_gather).
"""

from mh_tpu.parallel.mesh import chain_mesh, device_report
from mh_tpu.parallel.sharded import run_chains_sharded, run_chains_collective
