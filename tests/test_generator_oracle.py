"""Beam-search scoring-semantics oracle.

A pure-numpy, step-by-step replay of the reference's ONMT-style beam search
(`/root/reference/mPLUG/models/predictor.py:153-311`: GNMT length penalty
with alpha=0.6 at :61,209-213, min_length EOS block at :207-208, finished-
hypothesis bookkeeping at :255-293) is run against `beam_generate` on a
scripted decoder whose logits depend only on (position, last token), so both
implementations see identical distributions. Selected sequences and
normalized scores must match exactly — including a case where the length
penalty flips the winner vs. alpha=0.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from crvqa_tpu.models.mplug.generator import beam_generate

BOS, EOS, PAD = 1, 2, 0


def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def onmt_beam_reference(table, beam_size, max_length, min_length, alpha):
    """Literal single-item replay of predictor.py:_fast_translate_batch.

    `table[step, last_token] -> [V]` logits. Returns (normalized_score,
    sequence incl. BOS and EOS) of the best hypothesis (out_size=1).
    """
    v = table.shape[-1]
    alive = [[BOS] for _ in range(beam_size)]
    topk_log_probs = np.array([0.0] + [-np.inf] * (beam_size - 1))
    hyps = []
    for step in range(max_length):
        logits = np.stack([table[step, seq[-1]] for seq in alive])  # [W, V]
        log_probs = np.log(_softmax(logits))
        if step < min_length:
            log_probs[:, EOS] = -1e20
        length_penalty = ((5.0 + (step + 1)) / 6.0) ** alpha
        log_probs = log_probs + topk_log_probs[:, None]
        curr = (log_probs / length_penalty).reshape(-1)
        order = np.argsort(-curr, kind="stable")[:beam_size]
        topk_scores = curr[order]
        topk_log_probs = topk_scores * length_penalty
        parent, tok = order // v, order % v
        alive = [alive[p] + [int(t)] for p, t in zip(parent, tok)]
        is_fin = tok == EOS
        if step + 1 == max_length:
            is_fin[:] = True
        end_cond = bool(is_fin[0])
        if is_fin.any():
            if end_cond:
                is_fin[:] = True
            for j in np.nonzero(is_fin)[0]:
                hyps.append((topk_scores[j], list(alive[j])))
            if end_cond:
                return sorted(hyps, key=lambda x: -x[0])[0]
    raise AssertionError("loop must end via end_cond at the last step")


def _run_jax(table, beam_size, max_len, min_length, alpha, batch=1):
    """beam_generate over the scripted decoder; table is shared across the
    batch so every item selects the same answer."""
    jt = jnp.asarray(table, jnp.float32)
    L = max_len

    def decode(ids, mask, states, state_mask):
        pos = jnp.arange(L)
        return jt[pos[None, :], ids]  # [N, L, V]

    states = jnp.zeros((batch, 1, 1), jnp.float32)
    state_mask = jnp.ones((batch, 1), jnp.float32)
    ids, scores = beam_generate(decode, states, state_mask,
                                beam_size=beam_size, max_len=max_len,
                                bos=BOS, eos=EOS, pad=PAD,
                                lp_alpha=alpha, min_length=min_length)
    return np.asarray(ids), np.asarray(scores)


def _assert_match(ref, ids_row, score, max_len):
    ref_score, ref_seq = ref
    np.testing.assert_allclose(score, ref_score, rtol=2e-5, atol=1e-6)
    want = np.full((max_len,), PAD, np.int64)
    want[: len(ref_seq)] = ref_seq
    np.testing.assert_array_equal(ids_row, want)


@pytest.mark.parametrize("seed", range(12))
def test_beam_matches_onmt_replay(seed):
    rng = np.random.default_rng(seed)
    v, w, max_len = 7, 3, 7
    # small scale keeps candidate scores competitive so selection order is
    # actually exercised (large-scale logits make beam 0 trivially win)
    table = rng.normal(size=(max_len, v, v)).astype(np.float32) * 1.5
    ref = onmt_beam_reference(table, w, max_len - 1, 1, 0.6)
    ids, scores = _run_jax(table, w, max_len, 1, 0.6)
    _assert_match(ref, ids[0], scores[0], max_len)


def test_beam_batched_matches_per_item_replay():
    rng = np.random.default_rng(99)
    v, w, max_len, b = 6, 4, 6, 3
    tables = [rng.normal(size=(max_len, v, v)).astype(np.float32) * 1.5
              for _ in range(b)]
    # batch by running items separately (tables differ per item) vs jointly:
    # beam_generate is per-item independent, so concat single-item runs and
    # one batched run over a shared table must both hold
    for table in tables:
        ref = onmt_beam_reference(table, w, max_len - 1, 1, 0.6)
        ids, scores = _run_jax(table, w, max_len, 1, 0.6, batch=2)
        for i in range(2):
            _assert_match(ref, ids[i], scores[i], max_len)


def test_min_length_blocks_eos():
    """EOS is overwhelmingly the argmax at step 0; min_length must block it
    (predictor.py:207-208), so the answer has >= min_length real tokens."""
    rng = np.random.default_rng(5)
    v, w, max_len = 6, 3, 6
    table = rng.normal(size=(max_len, v, v)).astype(np.float32)
    table[0, BOS, EOS] = 50.0
    for min_length in (1, 2):
        ref = onmt_beam_reference(table, w, max_len - 1, min_length, 0.6)
        ids, scores = _run_jax(table, w, max_len, min_length, 0.6)
        _assert_match(ref, ids[0], scores[0], max_len)
        seq = ids[0]
        # the block must prevent the overwhelming EOS at steps < min_length
        # (bos at 0; step s writes position s+1); the winner may lack EOS
        # entirely if it ends via the last-step fill
        assert not np.any(seq[1 : min_length + 1] == EOS)


def test_length_penalty_flips_winner():
    """Find a table where alpha=0.6 selects a different sequence than
    alpha=0 (the r2 behavior), and assert beam_generate tracks the
    reference at both alphas — proving the penalty is live, not cosmetic."""
    v, w, max_len = 7, 3, 8
    flip = None
    for seed in range(400):
        rng = np.random.default_rng(10_000 + seed)
        table = rng.normal(size=(max_len, v, v)).astype(np.float32) * 1.2
        r06 = onmt_beam_reference(table, w, max_len - 1, 1, 0.6)
        r00 = onmt_beam_reference(table, w, max_len - 1, 1, 0.0)
        if r06[1] != r00[1]:
            flip = (table, r06, r00)
            break
    assert flip is not None, "no penalty-sensitive table found"
    table, r06, r00 = flip
    ids, scores = _run_jax(table, w, max_len, 1, 0.6)
    _assert_match(r06, ids[0], scores[0], max_len)
    ids0, scores0 = _run_jax(table, w, max_len, 1, 0.0)
    _assert_match(r00, ids0[0], scores0[0], max_len)
    assert list(ids[0]) != list(ids0[0])


# ------------------------------------------------- the REAL reference code
def _run_ref_predictor(tables, beam_size, max_length, min_length):
    """Drive the ACTUAL `mPLUG/models/predictor.py:TextGenerator` under
    torch on a scripted decoder. `tables[item, step, last_token] -> [V]`;
    the item index rides in the encoder states, which the predictor tiles
    and reorders with `select_indices` every step — so per-item divergent
    finishing (non_finished removal, :289-293) is exercised for real."""
    import types

    import torch

    from ref_oracle import load_ref_module

    pred_mod = load_ref_module("ref_predictor", "mPLUG/models/predictor.py")
    tt = torch.from_numpy(np.asarray(tables, np.float32))

    class ScriptedDecoder:
        def __call__(self, alive_seq, encoder_hidden_states=None,
                     encoder_attention_mask=None, return_dict=True,
                     reduction="none"):
            sel = encoder_hidden_states[:, 0, 0].long()  # item per row
            pos = torch.arange(alive_seq.shape[1])
            logits = tt[sel[:, None], pos[None, :], alive_seq]
            return types.SimpleNamespace(logits=logits)

    args = {"beam_size": beam_size, "min_length": min_length,
            "max_length": max_length}
    gen = pred_mod.TextGenerator(args, ScriptedDecoder())
    gen.start_token, gen.end_token = BOS, EOS
    b = len(tables)
    src = torch.arange(b, dtype=torch.float32).view(b, 1, 1)
    mask = torch.ones(b, 1)
    pred_ids, scores = gen.translate_batch((src, mask))
    return ([p[0].numpy() for p in pred_ids],
            [float(s[0]) for s in scores])


def test_beam_matches_real_reference_predictor():
    """beam_generate vs the reference TextGenerator itself (not a replay):
    a 4-item batch whose items finish at different steps, plus the
    min_length EOS-block case."""
    rng = np.random.default_rng(17)
    v, w, max_len, b = 7, 3, 7, 4
    tables = rng.normal(size=(b, max_len, v, v)).astype(np.float32) * 1.5
    # item 2: EOS overwhelming at step 0 so it finishes first
    tables[2, 0, BOS, EOS] = 8.0

    jt = jnp.asarray(tables)

    def decode(ids, mask, states, state_mask):
        sel = states[:, 0, 0].astype(jnp.int32)
        pos = jnp.arange(max_len)
        return jt[sel[:, None], pos[None, :], ids]

    states = jnp.arange(b, dtype=jnp.float32).reshape(b, 1, 1)
    state_mask = jnp.ones((b, 1), jnp.float32)

    for min_length in (1, 2):
        ref_seqs, ref_scores = _run_ref_predictor(
            tables, w, max_len - 1, min_length)
        ids, scores = beam_generate(decode, states, state_mask, beam_size=w,
                                    max_len=max_len, bos=BOS, eos=EOS,
                                    pad=PAD, lp_alpha=0.6,
                                    min_length=min_length)
        ids, scores = np.asarray(ids), np.asarray(scores)
        for i in range(b):
            np.testing.assert_allclose(scores[i], ref_scores[i],
                                       rtol=2e-5, atol=1e-6)
            want = np.full((max_len,), PAD, np.int64)
            want[: len(ref_seqs[i])] = ref_seqs[i]
            np.testing.assert_array_equal(ids[i], want, err_msg=f"item {i}")


def test_replay_matches_real_reference_predictor():
    """The numpy replay the other oracles lean on is itself validated
    against the real predictor on single-item batches."""
    rng = np.random.default_rng(23)
    v, w, max_len = 6, 4, 6
    for _ in range(6):
        table = rng.normal(size=(max_len, v, v)).astype(np.float32) * 1.5
        ref_score, ref_seq = onmt_beam_reference(table, w, max_len - 1, 1, 0.6)
        seqs, scores = _run_ref_predictor(table[None], w, max_len - 1, 1)
        np.testing.assert_allclose(ref_score, scores[0], rtol=1e-6)
        np.testing.assert_array_equal(ref_seq, seqs[0])
