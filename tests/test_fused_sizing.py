"""Fused-kernel block/VMEM sizing policy (pure Python, no TPU).

Pins the round-4 defaults: the preferred block from ``block_chains`` must
actually survive ``_get_runner``'s fit check — the scoped-VMEM request
auto-raises (bounded by ``PREF_VMEM_CAP``) instead of silently clamping
the block back down, and stale sidecar fits recorded under an older
default policy must not override a new one (the fit key carries the
preferred block).
"""

import os

import pytest

from mh_tpu.config import SamplerConfig
from mh_tpu.kernels.fused_mh import (
    DEFAULT_VMEM,
    PREF_VMEM_CAP,
    _fit_block_and_vmem,
    _fit_key,
    block_chains,
    fused_vmem_estimate,
)


@pytest.fixture
def _no_env_overrides():
    saved = {}
    for k in ("MH_FUSED_BLOCK", "MH_FUSED_VMEM", "MH_FUSED_STREAMS"):
        saved[k] = os.environ.pop(k, None)
    yield
    for k, v in saved.items():
        if v is not None:
            os.environ[k] = v


def test_preferred_block_fits_after_auto_raise(_no_env_overrides):
    # n=128 headline shape: preferred block is 128 and its estimate
    # exceeds the 17M default — the auto-raise in _get_runner computes
    # need = estimate/0.85 and must land under the cap so the fit loop
    # keeps the block instead of halving it
    for n in (128, 256):
        bc = block_chains(n)
        need = int(fused_vmem_estimate(bc, n, True) / 0.85)
        assert DEFAULT_VMEM < need <= PREF_VMEM_CAP, (n, bc, need)
        kept, vmem = _fit_block_and_vmem(bc, n, need, True)
        assert kept == bc, (n, bc, kept)
        assert vmem == need


def test_round4_defaults(_no_env_overrides):
    assert block_chains(128) == 128
    assert block_chains(256) == 64


def test_block_always_sublane_aligned(_no_env_overrides):
    # 4096//384 == 10: an unaligned block both misaligns [B, N] tiles and
    # strands the divisibility clamp on widths like 5 that cannot divide
    # power-of-two chain counts (raised ValueError before the fix)
    for n in (128, 256, 320, 384, 512, 640, 1024, 2048):
        bc = block_chains(n)
        assert bc % 8 == 0 and bc >= 8, (n, bc)


def test_fit_key_carries_preferred_block(_no_env_overrides):
    cfg = SamplerConfig()
    key = _fit_key(128, cfg, True, 1024)
    assert key.endswith(":pref128")
    # an env block override changes the preference and hence the key
    os.environ["MH_FUSED_BLOCK"] = "32"
    try:
        assert _fit_key(128, cfg, True, 1024).endswith(":pref32")
    finally:
        del os.environ["MH_FUSED_BLOCK"]


def test_fit_still_shrinks_when_cap_insufficient(_no_env_overrides):
    # a block whose estimate exceeds the cap must still be shrunk by the
    # fit loop (self-protection is not weakened by the auto-raise)
    bc, vmem = _fit_block_and_vmem(1024, 128, DEFAULT_VMEM, True)
    assert bc < 1024
    assert fused_vmem_estimate(bc, 128, True) <= 0.92 * vmem or bc == 8
