"""Device-side CLIP normalize (uint8 image path): bit-identical to the
host fp32 normalize, 4x less host->device traffic (the r5 chip session
measured the product beam eval transfer-bound at 18.5 ex/s with per-batch
57 MB fp32 image uploads through the tunnel)."""
import numpy as np
import pytest

import jax.numpy as jnp


def test_clip_normalize_u8_matches_host():
    from crvqa_tpu.data.augment import _normalize_u8
    from crvqa_tpu.models.mplug.vit import clip_normalize_u8

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    host = np.stack([_normalize_u8(x) for x in u8])
    dev = np.asarray(clip_normalize_u8(jnp.asarray(u8)))
    np.testing.assert_array_equal(host, dev)  # same fp32 arithmetic


def test_model_logits_identical_either_path():
    """Tiny MPlug forward on uint8 images == on host-normalized fp32
    images, bitwise (fp32 model; the ViT dispatches on dtype)."""
    import jax

    from crvqa_tpu.data.augment import _normalize_u8
    from crvqa_tpu.data.mplug_data import synthetic_mplug_batch
    from crvqa_tpu.models.mplug import MPlug, MPlugConfig

    config = MPlugConfig.tiny()
    model = MPlug(config)
    b = synthetic_mplug_batch(batch_size=2, image_res=config.vit.image_res,
                              vocab_size=config.bert.vocab_size,
                              uint8_images=True)
    u8 = b["images"]
    assert u8.dtype == np.uint8
    f32 = np.stack([_normalize_u8(x) for x in u8])

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(f32),
        jnp.asarray(b["question_ids"]), jnp.asarray(b["question_mask"]),
        jnp.asarray(b["answer_ids"]), jnp.asarray(b["answer_mask"]),
        jnp.asarray(b["weights"]))["params"]

    def loss(images):
        return model.apply(
            {"params": params}, jnp.asarray(images),
            jnp.asarray(b["question_ids"]), jnp.asarray(b["question_mask"]),
            jnp.asarray(b["answer_ids"]), jnp.asarray(b["answer_mask"]),
            jnp.asarray(b["weights"]), deterministic=True)

    np.testing.assert_array_equal(np.asarray(loss(f32)),
                                  np.asarray(loss(u8)))


def test_load_images_raw_roundtrip(tmp_path):
    """raw=True returns the exact pre-normalize uint8 pixels: normalizing
    them on host reproduces raw=False byte-for-byte, for both the test and
    the (seeded) train transform stacks."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from crvqa_tpu.data.augment import _normalize_u8
    from crvqa_tpu.data.mplug_data import load_images

    rng = np.random.RandomState(1)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.randint(0, 256, (40, 52, 3)).astype(np.uint8)
                        ).save(p)
        paths.append(str(p))

    f32 = load_images(paths, image_res=32)
    u8 = load_images(paths, image_res=32, raw=True)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(
        f32, np.stack([_normalize_u8(x) for x in u8]))

    f32t = load_images(paths, image_res=32,
                       rng=np.random.default_rng(7))
    u8t = load_images(paths, image_res=32, raw=True,
                      rng=np.random.default_rng(7))
    np.testing.assert_array_equal(
        f32t, np.stack([_normalize_u8(x) for x in u8t]))


def test_prefetch_device_puts_uint8_images():
    from crvqa_tpu.data.prefetch import _put_floats

    batch = {"images": np.zeros((2, 4, 4, 3), np.uint8),
             "qid": np.arange(2, dtype=np.int64)}
    out = _put_floats(batch)
    assert not isinstance(out["images"], np.ndarray)  # device array now
    assert isinstance(out["qid"], np.ndarray)


def test_transfer_cast_bf16_features_exact():
    """bf16-pre-cast visual features through a bf16 LXMERT stage-2 step ==
    fp32 features, bitwise: the masked matmul casts its inputs to the
    model dtype either way (the --transfer_dtype 'auto' contract)."""
    import jax

    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage2

    config = LxmertConfig.tiny(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=4, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(
        jax.random.PRNGKey(0), input_ids=batch["input_ids"][:2],
        visual_feats=batch["visual_feats"][:2],
        visual_pos=batch["visual_pos"][:2])["params"]
    masker = Masker.create(
        lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers),
        ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
        controlled_init="magnitude")
    cfg = stage2.Stage2Config(total_steps=10, hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))
    step = stage2.make_train_step(model, masker, tx, cfg)

    cast = dict(batch)
    for k in ("visual_feats", "visual_pos"):
        cast[k] = batch[k].astype(jnp.bfloat16)
    _, m32 = step(state, batch)  # donates state
    state2, _ = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))
    _, m16 = step(state2, cast)
    assert float(m32.loss) == float(m16.loss)


def test_transfer_cast_wrapper_dtype_rules():
    import types

    import ml_dtypes

    from crvqa_tpu.cli.common import wrap_transfer_cast

    def src():
        yield {"visual_feats": np.ones((2, 3), np.float32),
               "labels": np.ones((2, 4), np.float32)}

    out = next(iter(wrap_transfer_cast(
        lambda: src(), types.SimpleNamespace(transfer_dtype="auto",
                                             dtype="bfloat16"))()))
    assert out["visual_feats"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert out["labels"].dtype == np.float32  # loss math stays fp32

    out = next(iter(wrap_transfer_cast(
        lambda: src(), types.SimpleNamespace(transfer_dtype="auto",
                                             dtype="float32"))()))
    assert out["visual_feats"].dtype == np.float32  # auto: fp32 model
