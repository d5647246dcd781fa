"""Regression tests for the driver hooks in __graft_entry__.py.

Round-1 verdict: MULTICHIP_r01 was red because dryrun_multichip ran against
the real axon TPU (libtpu mismatch) instead of forcing the virtual CPU
platform. These tests pin the fix: the hook must run green in-process under
the pytest CPU mesh, and must detect an unusable pre-initialized backend.
"""
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_force_virtual_cpu_accepts_existing_cpu_mesh():
    # conftest already initialized an 8-device CPU backend; the helper must
    # recognize it as sufficient and NOT demand a subprocess.
    assert graft._force_virtual_cpu(8) is True
    assert graft._force_virtual_cpu(4) is True


def test_force_virtual_cpu_rejects_too_few_devices():
    # more devices than the initialized backend has -> must report False so
    # dryrun_multichip takes the clean-subprocess path.
    assert graft._force_virtual_cpu(len(jax.devices()) + 1) is False


def test_dryrun_multichip_inprocess():
    # Under the conftest CPU mesh this runs fully in-process: dp x tp mesh,
    # one train step, threshold reset, masked eval.
    graft.dryrun_multichip(4)


def test_entry_compiles():
    fn, args = graft.entry()
    logits = jax.jit(fn)(*args)
    assert logits.ndim == 2
