"""The functional masker: mask scores as a pytree parallel to the params.

TPU-native redesign of `masking/maskers_Robust.py` (Masker.patch_modules /
MaskedLinearX) and its variants (`maskers.py`, `global_maskers.py`,
`maskers_visualBert.py`, `mPLUG/masking/maskers.py`). Instead of swapping
`nn.Linear` modules for `MaskedLinear` wrappers, the mask scores live in a
flat dict keyed by the flax param path; the jitted train step merges
`w * binarize(scores, threshold)` into the frozen param tree before the model
apply. Gradients reach only the scores (via the straight-through binarizer)
and whatever the caller marks trainable — the JAX analogue of
`requires_grad=False` surgery at `maskers_Robust.py:577-642`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..ops.kthvalue import kth_smallest, sparsity_threshold
from .binarizers import get_binarizer
from .spec import MaskSpec

PyTree = Any
Scores = dict[str, jax.Array]
Thresholds = dict[str, jax.Array]


def _get_leaf(params: PyTree, path: tuple[str, ...]) -> jax.Array:
    node = params
    for p in path:
        node = node[p]
    return node


def _bthr(spec: MaskSpec, thr: jax.Array, ndim: int) -> jax.Array:
    """Reshape a stacked spec's per-layer thresholds [L] for broadcasting
    against its [L, ...] scores; unstacked thresholds pass through."""
    if spec.stacked:
        return thr.reshape((spec.stacked,) + (1,) * (ndim - 1))
    return thr


def bias_key(spec: MaskSpec) -> str:
    return "/".join(spec.path[:-1] + ("bias",))


def _per_layer_kth(x: jax.Array, k) -> jax.Array:
    """Batched exact kth-smallest over the leading layer axis: one sort of
    [L, n] instead of L separate sorts (the scan-over-layers win). `k` may be
    a Python int or a traced scalar (no recompile when a sparsity schedule
    moves the target)."""
    flat = x.reshape(x.shape[0], -1)
    idx = jnp.clip(jnp.asarray(k, jnp.int32) - 1, 0, flat.shape[1] - 1)
    return jnp.take(jnp.sort(flat, axis=1), idx, axis=1)


@dataclasses.dataclass(frozen=True)
class Masker:
    """Static mask configuration + pure functions over (params, scores).

    Args mirror the reference's Masker ctor (`maskers_Robust.py:491-513`):
    `threshold` (initial binarization threshold, default 1e-2), `init_scale`
    (random-init scale, default 2e-2), `controlled_init` in
    {None, 'magnitude', 'uniform', 'double_uniform', 'magnitude_soft'},
    `zerorate` maps modality -> target zero rate (`HPmodel_modal`).
    `global_prune` switches threshold resets to a single model-wide kth-value
    (`global_maskers.py:531-543`).
    """

    specs: tuple[MaskSpec, ...]
    zerorate: tuple[tuple[str, float], ...]
    threshold: float = 1e-2
    init_scale: float = 2e-2
    controlled_init: Optional[str] = "magnitude"
    binarizer_name: str = "MaskedLinear1"
    global_prune: bool = False
    # also mask bias vectors (`mask_biases`, maskers_Robust.py:109,365-367 —
    # default False in every shipped config). Bias scores live under
    # '<spec dir>/bias' keys; the reference binarizes the bias mask with the
    # MODULE's (weight) threshold — reset_threshold never touches a bias —
    # so no separate bias thresholds exist here either. Embedding specs have
    # no bias (the reference would crash there: controlled_init(None)).
    # With magnitude inits on FRESH (zero-initialized) biases every bias
    # gate starts dropped — same as the reference; meaningful bias masks
    # need a fine-tuned checkpoint's non-zero biases.
    mask_biases: bool = False

    @classmethod
    def create(cls, specs: Sequence[MaskSpec], zerorate: dict[str, float] | Any,
               **kw) -> "Masker":
        if hasattr(zerorate, "as_dict"):
            zerorate = zerorate.as_dict()
        m = cls(specs=tuple(specs), zerorate=tuple(sorted(zerorate.items())),
                **kw)
        if m.global_prune or m.controlled_init == "magnitude_global":
            # the reference's global maskers carry ONE zero rate
            # (global_maskers.py ctor takes a single sparsity); silently
            # picking an arbitrary modality's rate would prune the whole
            # model at e.g. the Fus rate
            rates = set(dict(m.zerorate).values())
            if len(rates) > 1:
                raise ValueError(
                    "global pruning needs a single zero rate; got per-"
                    f"modality rates {dict(m.zerorate)} — use "
                    "ModalSparsity.uniform")
        return m

    # ------------------------------------------------------------------ config
    @property
    def zerorate_dict(self) -> dict[str, float]:
        return dict(self.zerorate)

    def spec_sparsity(self, spec: MaskSpec) -> float:
        return self.zerorate_dict[spec.modality]

    def binarizer(self, rng: Optional[jax.Array] = None) -> Callable:
        return get_binarizer(self.binarizer_name, rng)

    # -------------------------------------------------------------------- init
    def init(self, params: PyTree, rng: Optional[jax.Array] = None
             ) -> tuple[Scores, Thresholds]:
        """Build (scores, thresholds) from the frozen params.

        Controlled inits mirror `MaskedLinearX.controlled_init`
        (`maskers_Robust.py:212-280`): 'magnitude' sets scores to 2*threshold
        where |w| exceeds its per-matrix kth-value and 0 elsewhere, so the
        initial binarized sparsity equals the per-modality target exactly.
        """
        scores: Scores = {}
        thresholds: Thresholds = {}
        if rng is None:
            rng = jax.random.PRNGKey(0)
        thr = self.threshold
        global_thr_value = None
        if self.controlled_init == "magnitude_global":
            # one kth-value over the concatenation of all masked |w|
            # (global_maskers.py:220-228, 531-543).
            all_abs = jnp.concatenate(
                [jnp.abs(jnp.ravel(_get_leaf(params, s.path))) for s in self.specs]
            )
            sp = next(iter(self.zerorate_dict.values()))
            global_thr_value = kth_smallest(all_abs, max(int(all_abs.size * sp), 1))

        for spec in self.specs:
            w = _get_leaf(params, spec.path)
            sp = self.spec_sparsity(spec)
            key = spec.key
            rng, sub = jax.random.split(rng)
            if spec.stacked:
                # per-layer semantics over the leading axis
                per_n = w.size // spec.stacked
                k = max(int(per_n * sp), 1)
                if self.controlled_init == "magnitude":
                    kth = _per_layer_kth(jnp.abs(w), k)
                    scores[key] = jnp.where(
                        jnp.abs(w) > _bthr(spec, kth, w.ndim),
                        2.0 * thr, 0.0).astype(jnp.float32)
                    thresholds[key] = jnp.full((spec.stacked,), thr, jnp.float32)
                elif self.controlled_init == "magnitude_soft":
                    scores[key] = jnp.abs(w).astype(jnp.float32)
                    thresholds[key] = _per_layer_kth(scores[key], k).astype(jnp.float32)
                elif self.controlled_init is None:
                    hi = (self.init_scale + thr) / sp - self.init_scale
                    scores[key] = jax.random.uniform(
                        sub, w.shape, jnp.float32, -self.init_scale, hi)
                    thresholds[key] = jnp.full((spec.stacked,), thr, jnp.float32)
                else:
                    raise NotImplementedError(
                        f"controlled_init={self.controlled_init!r} with "
                        "stacked specs")
                continue
            n = w.size
            k = max(int(n * sp), 1)
            if self.controlled_init is None:
                # uniform random in (-init_scale, s) chosen so the expected
                # initial binarized sparsity matches (get_init_scales,
                # maskers_Robust.py:282-294, MaskedLinear1 branch).
                hi = (self.init_scale + thr) / sp - self.init_scale
                scores[key] = jax.random.uniform(
                    sub, w.shape, jnp.float32, -self.init_scale, hi)
            elif self.controlled_init == "magnitude":
                kth = kth_smallest(jnp.abs(w), k)
                scores[key] = jnp.where(
                    jnp.abs(w) > kth, 2.0 * thr, 0.0).astype(jnp.float32)
            elif self.controlled_init == "magnitude_global":
                scores[key] = jnp.where(
                    jnp.abs(w) > global_thr_value, 2.0 * thr, 0.0
                ).astype(jnp.float32)
            elif self.controlled_init == "uniform":
                # random k zeros without replacement (maskers_Robust.py:230-240)
                perm = jax.random.permutation(sub, n)
                flat = jnp.where(perm < k, 0.0, 2.0 * thr)
                scores[key] = flat.reshape(w.shape).astype(jnp.float32)
            elif self.controlled_init == "double_uniform":
                # sample k indices WITH replacement; below-threshold values in
                # (0.5t, 0.9t), others in (1.1t, 1.5t) (maskers_Robust.py:242-257)
                sub1, sub2, sub3 = jax.random.split(sub, 3)
                idx = jax.random.randint(sub1, (k,), 0, n)
                keep = jnp.ones((n,), bool).at[idx].set(False)
                above = jax.random.uniform(sub2, (n,), jnp.float32, 1.1 * thr, 1.5 * thr)
                below = jax.random.uniform(sub3, (n,), jnp.float32, 0.5 * thr, 0.9 * thr)
                scores[key] = jnp.where(keep, above, below).reshape(w.shape)
            elif self.controlled_init == "magnitude_soft":
                # mPLUG variant: scores := |w|, threshold := kth(|w|)
                # (mPLUG/masking/maskers.py:218-224, 274-275)
                scores[key] = jnp.abs(w).astype(jnp.float32)
                thresholds[key] = kth_smallest(scores[key], k).astype(jnp.float32)
                continue
            else:
                raise NotImplementedError(
                    f"controlled_init={self.controlled_init!r} not supported")
            thresholds[key] = jnp.asarray(thr, jnp.float32)
        if self.mask_biases:
            # the reference runs the SAME controlled_init on each module's
            # bias vector (maskers_Robust.py:193-199); embeddings carry no
            # bias (its mask_biases path would crash there) and the scan
            # variant is unsupported with bias masking
            rng_b = jax.random.fold_in(rng, 17)
            for spec in self.specs:
                if spec.is_embedding:
                    continue
                if spec.stacked:
                    raise NotImplementedError(
                        "mask_biases with stacked (scan-variant) specs")
                parent = _get_leaf(params, spec.path[:-1])
                if "bias" not in parent:
                    continue
                rng_b, sub = jax.random.split(rng_b)
                scores[bias_key(spec)] = self._controlled_scores(
                    parent["bias"], self.spec_sparsity(spec), sub,
                    global_thr_value)
        return scores, thresholds

    def _controlled_scores(self, x: jax.Array, sp: float, sub: jax.Array,
                           global_thr_value=None) -> jax.Array:
        """controlled_init on one tensor (the bias-mask path; mirrors the
        unstacked weight branches above / maskers_Robust.py:212-280)."""
        thr = self.threshold
        n = x.size
        k = max(int(n * sp), 1)
        if self.controlled_init is None:
            hi = (self.init_scale + thr) / sp - self.init_scale
            return jax.random.uniform(sub, x.shape, jnp.float32,
                                      -self.init_scale, hi)
        if self.controlled_init == "magnitude":
            kth = kth_smallest(jnp.abs(x), k)
            return jnp.where(jnp.abs(x) > kth, 2.0 * thr, 0.0
                             ).astype(jnp.float32)
        if self.controlled_init == "magnitude_global":
            return jnp.where(jnp.abs(x) > global_thr_value, 2.0 * thr, 0.0
                             ).astype(jnp.float32)
        if self.controlled_init == "magnitude_soft":
            # NOTE: the module threshold stays the kth of the WEIGHT scores
            return jnp.abs(x).astype(jnp.float32)
        if self.controlled_init == "uniform":
            perm = jax.random.permutation(sub, n)
            return jnp.where(perm < k, 0.0, 2.0 * thr
                             ).reshape(x.shape).astype(jnp.float32)
        if self.controlled_init == "double_uniform":
            sub1, sub2, sub3 = jax.random.split(sub, 3)
            idx = jax.random.randint(sub1, (k,), 0, n)
            keep = jnp.ones((n,), bool).at[idx].set(False)
            above = jax.random.uniform(sub2, (n,), jnp.float32,
                                       1.1 * thr, 1.5 * thr)
            below = jax.random.uniform(sub3, (n,), jnp.float32,
                                       0.5 * thr, 0.9 * thr)
            return jnp.where(keep, above, below).reshape(x.shape)
        raise NotImplementedError(self.controlled_init)

    # ------------------------------------------------------------------- apply
    def apply_masks(self, params: PyTree, scores: Scores, thresholds: Thresholds,
                    rng: Optional[jax.Array] = None,
                    momentum_tree: bool = False) -> PyTree:
        """Return a param tree with masked leaves replaced by w * binarize(s).

        Gradients w.r.t. `scores` flow through the STE; `params` is typically
        held constant by the caller's grad signature (stage 2) or trainable
        (stages 1/3 use no masks). `momentum_tree=True` additionally applies
        specs marked `momentum_only` (the mPLUG mask_classifier quirk).
        """
        binarize = self.binarizer(rng)
        flat = traverse_util.flatten_dict(params)
        for spec in self.specs:
            if spec.momentum_only and not momentum_tree:
                continue
            key = spec.key
            w = flat[spec.path]
            t = _bthr(spec, thresholds[key], w.ndim)
            m = binarize(scores[key], t).astype(w.dtype)
            flat[spec.path] = w * m
            if self.mask_biases:
                bk = bias_key(spec)
                bpath = spec.path[:-1] + ("bias",)
                if bk in scores and bpath in flat:
                    # the bias mask binarizes with the MODULE's (weight)
                    # threshold — get_masks reuses self.threshold for both
                    # (maskers_Robust.py:360-367) and reset_threshold only
                    # ever re-derives it from the weight scores
                    b = flat[bpath]
                    mb = binarize(scores[bk], thresholds[key]).astype(b.dtype)
                    flat[bpath] = b * mb
        return traverse_util.unflatten_dict(flat)

    # --------------------------------------------------------------- threshold
    def reset_thresholds(self, scores: Scores,
                         sparsity_override: Optional[float] = None
                         ) -> Thresholds:
        """Recompute each module's threshold as the kth-value of its scores.

        Per-modality targets, exactly `Trainer.reset_threshold`
        (`mask_trainer_Robust_VQA.py:467-482`). With `global_prune`, a single
        kth-value over all scores (`global_mask_trainer_VQA` path).
        `sparsity_override` serves schedule-driven targets (the mPLUG
        MaskerScheduler path, `mPLUG/vqa_mplug.py:206-212` +
        `mPLUG/masking/maskers.py:689-711`).
        """
        if self.global_prune:
            all_scores = jnp.concatenate([jnp.ravel(scores[s.key]) for s in self.specs])
            sp = (sparsity_override if sparsity_override is not None
                  else next(iter(self.zerorate_dict.values())))
            k = jnp.maximum(jnp.asarray(all_scores.size * sp, jnp.int32), 1)
            t = kth_smallest(all_scores, k).astype(jnp.float32)
            # keep per-spec threshold SHAPES consistent with init's: stacked
            # specs carry per-layer [L] thresholds (_bthr reshapes them)
            return {s.key: (jnp.full((s.stacked,), t) if s.stacked else t)
                    for s in self.specs}
        out: Thresholds = {}
        for s in self.specs:
            sp = (sparsity_override if sparsity_override is not None
                  else self.spec_sparsity(s))
            sc = scores[s.key]
            if s.stacked:
                # int() truncation matches the reference's int(n*sp); jnp
                # int32 cast truncates identically and admits a traced sp
                k = jnp.maximum(
                    jnp.asarray((sc.size // s.stacked) * sp, jnp.int32), 1)
                out[s.key] = _per_layer_kth(sc, k).astype(jnp.float32)
            else:
                out[s.key] = sparsity_threshold(sc, sp).astype(jnp.float32)
        return out

    # ----------------------------------------------------------------- reports
    def binary_masks(self, scores: Scores, thresholds: Thresholds) -> dict[str, jax.Array]:
        """Bool masks keyed by spec key (True = kept weight)."""
        return {
            s.key: scores[s.key] > _bthr(s, thresholds[s.key],
                                         scores[s.key].ndim)
            for s in self.specs
        }

    def sparsity_report(self, scores: Scores, thresholds: Thresholds
                        ) -> dict[str, jax.Array]:
        """Per-modality + overall achieved zero rates (on device, psum-able).

        Mirrors the audit logging in `save_model_mask`
        (`mask_trainer_Robust_VQA.py:979-989`).
        """
        zeros: dict[str, jax.Array] = {}
        elems: dict[str, jax.Array] = {}
        for s in self.specs:
            t = _bthr(s, thresholds[s.key], scores[s.key].ndim)
            z = jnp.sum(scores[s.key] <= t).astype(jnp.float32)
            n = jnp.asarray(scores[s.key].size, jnp.float32)
            zeros[s.modality] = zeros.get(s.modality, 0.0) + z
            elems[s.modality] = elems.get(s.modality, 0.0) + n
            zeros["all"] = zeros.get("all", 0.0) + z
            elems["all"] = elems.get("all", 0.0) + n
        return {k: zeros[k] / elems[k] for k in zeros}

    def mask_drift(self, scores: Scores, thresholds: Thresholds,
                   ref_masks: dict[str, jax.Array]) -> jax.Array:
        """Fraction of mask entries that differ from a reference mask —
        `log_mask_info`'s mask_distance / mask_change telemetry
        (`mask_trainer_Robust_VQA.py:457-465`)."""
        changed = jnp.asarray(0.0)
        total = 0
        for s in self.specs:
            t = _bthr(s, thresholds[s.key], scores[s.key].ndim)
            cur = scores[s.key] > t
            changed = changed + jnp.sum(cur != ref_masks[s.key])
            total += cur.size
        return changed / total

    def prune_params(self, params: PyTree, masks: dict[str, jax.Array]) -> PyTree:
        """Permanently zero masked weights (stage 3's `pruning_model_with_mask`,
        `run_vqa_stage3.py:227-324`). `masks` are bool arrays keyed by spec key."""
        flat = traverse_util.flatten_dict(params)
        for spec in self.specs:
            w = flat[spec.path]
            flat[spec.path] = w * masks[spec.key].astype(w.dtype)
        return traverse_util.unflatten_dict(flat)


def magnitude_masks(params: PyTree, specs: Sequence[MaskSpec],
                    zerorate: dict[str, float]) -> dict[str, jax.Array]:
    """Per-matrix magnitude pruning over EVERY masked module at the
    per-modality rates: keep the top-(1-sparsity) |w| per matrix. This is the
    all-modality variant of the stage-3 rand baseline (`--rand_scope all`);
    the reference-exact scope is `reference_rand_masks` below."""
    masks = {}
    for spec in specs:
        w = _get_leaf(params, spec.path)
        sp = zerorate[spec.modality]
        if spec.stacked:
            k = max(int((w.size // spec.stacked) * sp), 1)
            kth = _bthr(spec, _per_layer_kth(jnp.abs(w), k), w.ndim)
        else:
            kth = kth_smallest(jnp.abs(w), max(int(w.size * sp), 1))
        masks[spec.key] = jnp.abs(w) > kth
    return masks


# substrings of spec.torch_name covered by the reference's mag_pruning
# module list (run_vqa_stage3.py:209-226): the 9 language layers (its
# range(12) loop names layers 9-11 that exist only in 12-layer BERT stacks —
# those names simply never match), the pooler, and the word embeddings.
# r_layers / x_layers / visn_fc are NEVER magnitude-pruned by the reference.
_REFERENCE_RAND_SCOPE = (".encoder.layer.", ".pooler.dense",
                         ".embeddings.word_embeddings")


def reference_rand_masks(params: PyTree, specs: Sequence[MaskSpec],
                         zero_rate: float) -> dict[str, jax.Array]:
    """The stage-3 `FT_randMask` baseline exactly as the reference ships it
    (`mag_pruning`, run_vqa_stage3.py:209-226): `prune.l1_unstructured`
    over ONLY the language-layer linears + pooler + word embeddings, each at
    `zero_rate`; the visual and cross-modal branches stay dense. Prune count
    per matrix is round(zero_rate * n) (torch's _compute_nparams_toprune);
    out-of-scope modules get all-ones masks so `prune_params` /
    `see_weight_rate` can treat the mask dict uniformly.

    (As shipped, the reference then crashes in `see_weight_rate` — it reads
    `weight_mask` keys for r_layers/x_layers that mag_pruning never created.
    We keep its pruning behavior and make the audit total well-defined by
    counting unpruned modules as dense.)

    Tie handling deviates by one detail: torch's topk keeps exactly n-k
    entries breaking |w| ties by index order; we keep strictly-above-kth
    (measure-zero difference for float weights).
    """
    masks = {}
    for spec in specs:
        w = _get_leaf(params, spec.path)
        if not any(s in spec.torch_name for s in _REFERENCE_RAND_SCOPE):
            masks[spec.key] = jnp.ones(w.shape, bool)
            continue
        per_n = w.size // spec.stacked if spec.stacked else w.size
        k = int(round(zero_rate * per_n))
        if k <= 0:
            masks[spec.key] = jnp.ones(w.shape, bool)
            continue
        if spec.stacked:
            kth = _bthr(spec, _per_layer_kth(jnp.abs(w), k), w.ndim)
        else:
            kth = kth_smallest(jnp.abs(w), k)
        masks[spec.key] = jnp.abs(w) > kth
    return masks
