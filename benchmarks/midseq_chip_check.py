"""On-chip validation of the midseq attention kernel (ops/midseq_attention.py).

The test suite runs the kernel in interpret mode only (the CPU backend cannot
compile Mosaic); this script is the first REAL compile: it builds the kernel
at the three mPLUG target shapes (ViT 577x577 self-attention, fusion 50x577
cross-attention, ~602x602 joint attention), compares forward and backward
against the XLA reference path on the same device, and checks dropout
determinism. Run it once per kernel change BEFORE benchmarks; a Mosaic
lowering error or numerics drift shows up here in ~2 min instead of inside a
15-min bench.

Usage: timeout 1200 python benchmarks/midseq_chip_check.py
Prints one OK/FAIL line per case and exits non-zero on any failure.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from crvqa_tpu.ops import midseq_attention as ma
from crvqa_tpu.ops.fused_attention import reference_attention

# (name, sq, sk, heads, head_size, dtype) — the shapes the kernel exists for
CASES = [
    ("vit_self_577", 577, 577, 12, 64, jnp.bfloat16),
    ("fusion_cross_50x577", 50, 577, 12, 64, jnp.bfloat16),
    ("joint_602", 602, 602, 12, 64, jnp.bfloat16),
    ("vit_self_577_fp32", 577, 577, 12, 64, jnp.float32),
]


def run_case(name, sq, sk, h, d, dtype, batch=4):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(batch, sq, h * d)), dtype)
    k = jnp.asarray(rng.normal(size=(batch, sk, h * d)), dtype)
    v = jnp.asarray(rng.normal(size=(batch, sk, h * d)), dtype)
    bias = np.zeros((batch, sk), np.float32)
    bias[:, sk - 3:] = -10000.0
    bias = jnp.asarray(bias)
    seed = jnp.zeros((1,), jnp.int32)
    assert ma.supported(batch, sq, sk, h, d, jnp.dtype(dtype).itemsize), name

    # fp32 tolerance is bf16-scale ON CHIP: TPU fp32 dots run at DEFAULT
    # matmul precision (bf16 multiplies on the MXU), so kernel and XLA each
    # sit ~4.3e-3 from a float64 oracle (measured IDENTICAL max-rel for
    # both on v5e) and ~2.6e-4 from each other (reduction order). The old
    # 2e-5 was an interpret-mode (true-fp32 CPU) number no on-chip path
    # can meet without precision=HIGHEST (3-pass, ~3x MXU cost).
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-3

    @jax.jit
    def fwd(q, k, v):
        return ma.midseq_attention_seeded(q, k, v, bias, seed, h, d, 0.0,
                                          False)

    out = np.asarray(fwd(q, k, v), np.float32)
    ref = np.asarray(reference_attention(q, k, v, bias, h, d), np.float32)
    err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-6)
    ok_f = err < tol

    tgt = jnp.asarray(rng.normal(size=(batch, sq, h * d)), jnp.float32)

    def loss(att):
        return lambda q, k, v: jnp.sum(
            (att(q, k, v).astype(jnp.float32) - tgt) ** 2)

    gk = jax.jit(jax.grad(loss(lambda q, k, v: ma.midseq_attention_seeded(
        q, k, v, bias, seed, h, d, 0.0, False)), argnums=(0, 1, 2)))
    gr = jax.jit(jax.grad(loss(lambda q, k, v: reference_attention(
        q, k, v, bias, h, d)), argnums=(0, 1, 2)))
    errs = []
    for a, b in zip(gk(q, k, v), gr(q, k, v)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        errs.append(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6))
    # bwd tolerance looser: the XLA path keeps bf16 probs, the kernel fp32;
    # fp32 bwd carries the same DEFAULT-precision MXU error as the forward
    ok_b = max(errs) < (5e-2 if dtype == jnp.bfloat16 else 2e-3)

    # dropout: deterministic per seed, actually drops
    @jax.jit
    def fdrop(s):
        return ma.midseq_attention_seeded(q, k, v, bias, s, h, d, 0.1, False)

    o1 = np.asarray(fdrop(jnp.asarray([7], jnp.int32)), np.float32)
    o1b = np.asarray(fdrop(jnp.asarray([7], jnp.int32)), np.float32)
    o2 = np.asarray(fdrop(jnp.asarray([8], jnp.int32)), np.float32)
    ok_d = (o1 == o1b).all() and (o1 != o2).any() and (o1 != out).any()

    print(f"{'OK ' if ok_f and ok_b and ok_d else 'FAIL'} {name}: "
          f"fwd_rel {err:.2e} bwd_rel {max(errs):.2e} dropout "
          f"{'ok' if ok_d else 'BAD'}", flush=True)
    return ok_f and ok_b and ok_d


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ok = all([run_case(*c) for c in CASES])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
