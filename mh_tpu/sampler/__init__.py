"""Samplers: MH core + tempering / SMC / HMC / VI / generic-density layers.

- :mod:`mh_tpu.sampler.mh` — the base MH chain (lax.scan + vmap)
- :mod:`mh_tpu.sampler.proposal` — translate/rotate/swap block proposals
- :mod:`mh_tpu.sampler.tempering` — parallel tempering over a device mesh
- :mod:`mh_tpu.sampler.smc` — annealed SMC with distributed resampling
- :mod:`mh_tpu.sampler.hmc` — leapfrog HMC with dual-averaging warmup
- :mod:`mh_tpu.sampler.nuts` — multinomial NUTS (static-shape tree doubling)
- :mod:`mh_tpu.sampler.mala` — Metropolis-adjusted Langevin (one grad/step)
- :mod:`mh_tpu.sampler.vi` — mean-field Gaussian VI
- :mod:`mh_tpu.sampler.generic` — RW-MH over arbitrary log-densities
- :mod:`mh_tpu.sampler.incremental` — exact delta-cost variant (see its
  docstring for the measured tradeoff)
"""

from mh_tpu.sampler.mh import (
    MHState,
    compile_chains,
    mh_init,
    mh_step,
    run_chain,
    run_chains,
)
from mh_tpu.sampler.tempering import geometric_ladder, run_tempered
from mh_tpu.sampler.smc import run_smc
from mh_tpu.sampler.hmc import hmc_sample
from mh_tpu.sampler.nuts import nuts_sample
from mh_tpu.sampler.mala import mala_sample
from mh_tpu.sampler.vi import meanfield_vi
from mh_tpu.sampler.generic import layout_logdensity, rw_metropolis
