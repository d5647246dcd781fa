"""Structured masking: per-head / per-matrix ("layers") mask scores.

Re-design of the structured branches of `MaskedLinearX`
(maskers_Robust.py:139-178 — 'layers': one scalar score per matrix; 'heads':
one score per attention head expanded over the head's rows via
`structured_mask_expanding` / `reshape_mask_for_sp` :305-320) and the
standalone head/FFN binarizers of the stage-3 structured path
(`prune_debias_VQA.py:633-667`: Binarizer_head masks the globally
lowest-scoring `num_to_mask` heads; Binarizer_ffn is the plain threshold
STE over FFN neurons).

Scores here live in the same flat dict as unstructured masking but with
reduced shapes — () for 'layers', (num_heads,) for 'heads' — and are
broadcast-expanded onto the kernel inside the jitted apply. Unlike
unstructured masks, structured zero patterns DO translate into dense-compute
savings (whole columns of the kernel drop), which is where a sparse/pruned
matmul actually pays off on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..ops.kthvalue import kth_smallest
from .binarizers import binarize_ste
from .masker import Masker, PyTree, Scores, Thresholds, _bthr, _get_leaf
from .spec import MaskSpec


@jax.custom_vjp
def binarize_head_ste(scores: jax.Array, num_to_mask) -> jax.Array:
    """Zero EXACTLY the globally lowest `num_to_mask` entries of a [L, H]
    head-score matrix, keep the rest at 1; identity gradient
    (`Binarizer_head`, prune_debias_VQA.py:633-650). Rank-based rather than
    threshold-based so ties zero exactly k heads and num_to_mask=0 masks
    none — matching `head_mask_from_scores`'s argsort export semantics (a
    kth-value threshold with strict `>` zeroes ALL tied heads and always at
    least one)."""
    flat = jnp.ravel(scores)
    rank = jnp.argsort(jnp.argsort(flat))  # rank 0 = smallest, stable
    mask = (rank >= jnp.asarray(num_to_mask, jnp.int32)).astype(scores.dtype)
    return mask.reshape(scores.shape)


def _bh_fwd(scores, num_to_mask):
    return binarize_head_ste(scores, num_to_mask), None


def _bh_bwd(_, g):
    return (g, None)


binarize_head_ste.defvjp(_bh_fwd, _bh_bwd)

# Binarizer_ffn (prune_debias_VQA.py:652-667) == the plain threshold STE.
binarize_ffn_ste = binarize_ste


def expand_head_mask_to_kernel(head_mask: jax.Array, kernel_shape) -> jax.Array:
    """[num_heads] head mask -> [in, out] kernel mask: each head owns a
    contiguous block of `head_size` output columns (the flax transpose of
    reshape_mask_for_sp, maskers_Robust.py:305-320)."""
    in_dim, out_dim = kernel_shape
    num_heads = head_mask.shape[-1]
    head_size = out_dim // num_heads
    cols = jnp.repeat(head_mask, head_size)
    return jnp.broadcast_to(cols[None, :], (in_dim, out_dim))


@dataclasses.dataclass(frozen=True)
class StructuredMasker(Masker):
    """'heads' or 'layers' structured mask training.

    structured_types filters which specs are structurally masked (the
    reference's `structured_masking_types`, e.g. ('self',) to hit only the
    q/k/v projections); remaining specs fall back to unstructured scores.
    """

    structured_masking: str = "heads"  # 'heads' | 'layers'
    structured_types: tuple[str, ...] = ("self",)
    num_heads: int = 12

    def _is_structured(self, spec: MaskSpec) -> bool:
        return any(t in ".".join(spec.path) for t in self.structured_types)

    def init(self, params: PyTree, rng: Optional[jax.Array] = None
             ) -> tuple[Scores, Thresholds]:
        if self.mask_biases:
            # the structured apply path gates whole heads/matrices of the
            # KERNELS; silently training bias scores it never applies would
            # be a trap (the reference's structured templates share one [H]
            # template across weight and bias — unreachable dead code)
            raise NotImplementedError(
                "mask_biases with structured masking is not supported")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        # independent streams: the delegated unstructured init consumes its
        # own branch so the structured loop below never reuses its subkeys
        rng, u_rng = jax.random.split(rng)
        scores: Scores = {}
        thresholds: Thresholds = {}
        unstructured = [s for s in self.specs if not self._is_structured(s)]
        if unstructured:
            sub = dataclasses.replace(self, specs=tuple(unstructured),
                                      structured_types=())
            u_scores, u_thr = Masker.init(sub, params, u_rng)
            scores.update(u_scores)
            thresholds.update(u_thr)
        for spec in self.specs:
            if not self._is_structured(spec):
                continue
            rng, sub_rng = jax.random.split(rng)
            shape = () if self.structured_masking == "layers" else (self.num_heads,)
            # uniform init in (-init_scale, init_scale): the structured branch
            # has no controlled init (maskers_Robust.py:146, 165-167)
            scores[spec.key] = jax.random.uniform(
                sub_rng, shape, jnp.float32, -self.init_scale, self.init_scale)
            thresholds[spec.key] = jnp.asarray(self.threshold, jnp.float32)
        return scores, thresholds

    def _expand(self, spec: MaskSpec, mask: jax.Array, kernel) -> jax.Array:
        if mask.ndim == 0:  # 'layers': scalar gate
            return jnp.broadcast_to(mask, kernel.shape)
        return expand_head_mask_to_kernel(mask, kernel.shape)

    def apply_masks(self, params: PyTree, scores: Scores, thresholds: Thresholds,
                    rng: Optional[jax.Array] = None,
                    momentum_tree: bool = False) -> PyTree:
        # same contract as the base (incl. the momentum_only skip) so a
        # StructuredMasker substitutes anywhere a Masker does
        binarize = self.binarizer(rng)
        flat = traverse_util.flatten_dict(params)
        for spec in self.specs:
            if spec.momentum_only and not momentum_tree:
                continue
            w = flat[spec.path]
            if self._is_structured(spec):
                m = self._expand(
                    spec, binarize(scores[spec.key], thresholds[spec.key]), w)
            else:
                # unstructured fallback keeps the base semantics, incl. the
                # stacked-spec per-layer threshold reshape (scan models)
                t = _bthr(spec, thresholds[spec.key], w.ndim)
                m = binarize(scores[spec.key], t)
            flat[spec.path] = w * m.astype(w.dtype)
        return traverse_util.unflatten_dict(flat)

    def reset_thresholds(self, scores: Scores,
                         sparsity_override: Optional[float] = None
                         ) -> Thresholds:
        out: Thresholds = {}
        unstructured = [s for s in self.specs if not self._is_structured(s)]
        if unstructured:
            # delegate so stacked specs get their per-layer kth (the local
            # loop would collapse them to one global kth) and global_prune
            # keeps its base meaning
            sub = dataclasses.replace(self, specs=tuple(unstructured),
                                      structured_types=())
            out.update(Masker.reset_thresholds(sub, scores,
                                               sparsity_override))
        for s in self.specs:
            if not self._is_structured(s):
                continue
            sc = scores[s.key]
            if sc.ndim == 0:
                # scalar gates keep the nominal threshold
                out[s.key] = jnp.asarray(self.threshold, jnp.float32)
            else:
                sp = (sparsity_override if sparsity_override is not None
                      else self.spec_sparsity(s))
                k = max(int(sc.size * sp), 1)
                out[s.key] = kth_smallest(sc, k).astype(jnp.float32)
        return out

    def sparsity_report(self, scores: Scores, thresholds: Thresholds,
                        params: Optional[PyTree] = None):
        """Achieved zero rates. Pass `params` to weight each structured
        score by the WEIGHT elements it controls (a head score gates
        head_size x hidden kernel entries; a 'layers' gate the whole
        matrix) — the true weight sparsity for mixed
        structured/unstructured spec sets. Without `params`, entries count
        as single gates (gate-level sparsity). Per-modality breakdown kept
        from the base contract."""
        zeros: dict[str, jax.Array] = {}
        elems: dict[str, jax.Array] = {}
        for s in self.specs:
            sc = scores[s.key]
            z = jnp.sum(sc <= thresholds[s.key]).astype(jnp.float32)
            n = jnp.asarray(max(sc.size, 1), jnp.float32)
            if self._is_structured(s) and params is not None:
                # scale gate counts to controlled weight elements
                w = _get_leaf(params, s.path)
                per_gate = w.size / max(sc.size, 1)
                z = z * per_gate
                n = n * per_gate
            zeros[s.modality] = zeros.get(s.modality, 0.0) + z
            elems[s.modality] = elems.get(s.modality, 0.0) + n
            zeros["all"] = zeros.get("all", 0.0) + z
            elems["all"] = elems.get("all", 0.0) + n
        return {k: zeros[k] / elems[k] for k in zeros}


def magnitude_head_scores(params: PyTree, specs: Sequence[MaskSpec],
                          num_heads: int) -> dict[str, jax.Array]:
    """Importance init for head scores: L2 norm of each head's columns."""
    out = {}
    for spec in specs:
        w = _get_leaf(params, spec.path)
        in_dim, out_dim = w.shape
        head_size = out_dim // num_heads
        per_head = jnp.linalg.norm(
            w.reshape(in_dim, num_heads, head_size), axis=(0, 2))
        out[spec.key] = per_head.astype(jnp.float32)
    return out
