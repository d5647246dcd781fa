"""Pretrained mPLUG torch-checkpoint import — product-surface oracle.

A fabricated tiny checkpoint in the reference's PRETRAIN format (`model`
wrap, `bert.`/`fusion.`-prefixed text towers, visual pos-embed at a
different image resolution) is loaded two ways:

  1. through the reference's LITERAL load block — `mPLUG/vqa_mplug.py:
     338-376` exec'd verbatim (model/module unwrap, hard-coded-768 pos-embed
     resize, fusion./bert. key shim, strict=False load) into real reference
     torch towers;
  2. through our `core.torch_compat.load_mplug_torch_checkpoint` into the
     flax MPlug tree (the `--init_ckpt *.pth` CLI path).

and the two models must produce identical decoder logits — at matching AND
mismatched image resolutions. Momentum-twin (`_m`) import and the
`strip_fusion_bert_keys` delete-on-self-rename quirk are covered separately.
"""
import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.models.mplug.bert import MPlugBertConfig
from crvqa_tpu.models.mplug.mplug import MPlug, MPlugConfig
from crvqa_tpu.models.mplug.vit import ViTConfig

from test_ref_oracle_mplug import _bert_cfg, _fusion_dead_params

torch = ref_oracle.install_mplug()
clip_model = ref_oracle.load_ref_module("ref_clip_model",
                                        "mPLUG/models/clip/model.py")
mplug_ref = ref_oracle.load_ref_module("ref_modeling_mplug",
                                       "mPLUG/models/modeling_mplug.py")
visual_transformers = ref_oracle.load_ref_module(
    "ref_visual_transformers", "mPLUG/models/visual_transformers.py")

REF_VQA_MPLUG = os.path.join(ref_oracle.REFERENCE, "mPLUG", "vqa_mplug.py")


class _VisualWrap(torch.nn.Module):
    """initialize_clip returns the full CLIP model; the VQA model only calls
    `.visual` (model_vqa_mplug.py:33) and checkpoints carry the
    `visual_encoder.visual.` prefix."""

    def __init__(self, visual):
        super().__init__()
        self.visual = visual


class RefMPLUG(torch.nn.Module):
    """The reference MPLUG attribute layout (model_vqa_mplug.py:22-25) built
    from the actual reference tower classes."""

    def __init__(self, c: MPlugBertConfig, vit_c: ViTConfig):
        super().__init__()
        self.visual_encoder = _VisualWrap(clip_model.VisualTransformer(
            input_resolution=vit_c.image_res, patch_size=vit_c.patch_size,
            width=vit_c.width, layers=vit_c.layers, heads=vit_c.heads,
            output_dim=16))
        self.text_encoder = mplug_ref.BertModel(
            _bert_cfg(c, c.text_encoder_layers), add_pooling_layer=False)
        self.fusion_encoder = mplug_ref.FusionModel(
            _bert_cfg(c, c.text_encoder_layers + c.fusion_layers),
            add_pooling_layer=False)
        self.text_decoder = mplug_ref.BertLMHeadModel(
            _bert_cfg(c, c.text_decode_layers, add_cross_attention=True,
                      is_decoder=True))


def _pretrain_format_sd(model: RefMPLUG) -> dict:
    """Reshape a RefMPLUG state_dict into the pretraining-checkpoint key
    format the reference's fusion./bert. shim expects (vqa_mplug.py:367-371):
    text/fusion towers carry a `bert.`/`fusion.` inner prefix; the decoder
    (key contains 'decode') keeps its natural `bert.` prefix; the LM head's
    decoder weights are stored TIED to the word embeddings (like the
    published checkpoints, whose models tie them)."""
    sd = {}
    for k, v in model.state_dict().items():
        if k.startswith("text_encoder."):
            k = "text_encoder.bert." + k[len("text_encoder."):]
        elif k.startswith("fusion_encoder."):
            k = "fusion_encoder.fusion." + k[len("fusion_encoder."):]
        sd[k] = v.clone()
    sd["text_decoder.cls.predictions.decoder.weight"] = sd[
        "text_decoder.bert.embeddings.word_embeddings.weight"].clone()
    sd["text_decoder.cls.predictions.decoder.bias"] = sd[
        "text_decoder.cls.predictions.bias"].clone()
    # noise our import must drop: the CLIP text transformer + projection
    sd["visual_encoder.visual.proj"] = torch.randn(32, 16)
    sd["visual_encoder.token_embedding.weight"] = torch.randn(7, 16)
    sd["visual_encoder.logit_scale"] = torch.tensor(2.0)
    return sd


def _run_reference_block(ckpt_path: str, model: RefMPLUG, image_res: int):
    """Exec the reference's checkpoint-load block (vqa_mplug.py:338-376)
    verbatim against a RefMPLUG.

    Latent reference defect: `resize_pos_embed` returns a batched
    [1, N+1, D] tensor which the block writes straight into the state dict
    (:354-356); torch's `load_state_dict` (strict=False included) collects
    the size mismatch and RAISES — after copying every other parameter.
    The unambiguous intent is the squeezed [N+1, D] table, so we catch that
    exact error and apply it (our import does the same, minus the crash)."""
    with open(REF_VQA_MPLUG) as f:
        lines = f.readlines()
    snippet = "".join(l[4:] if l[:4] == "    " else l
                      for l in lines[337:376])
    assert snippet.startswith("if args.checkpoint:")
    ns = dict(
        torch=torch, nn=torch.nn, np=np, model=model,
        resize_pos_embed=visual_transformers.resize_pos_embed,
        args=types.SimpleNamespace(checkpoint=ckpt_path, evaluate=False,
                                   do_mask=False),
        config={"clip_name": "ViT-B-16", "image_res": image_res,
                "distill": False},
        print=lambda *a, **k: None)
    try:
        exec(compile(snippet, REF_VQA_MPLUG, "exec"), ns)
    except RuntimeError as e:
        msg = str(e)
        assert "size mismatch" in msg and "positional_embedding" in msg
        assert msg.count("size mismatch") == 1  # only the pos-embed defect
        with torch.no_grad():
            model.visual_encoder.visual.positional_embedding.copy_(
                ns["state_dict"]
                ["visual_encoder.visual.positional_embedding"].squeeze(0))
    model.eval()
    return model


def _flax_template(c: MPlugBertConfig, vit_c: ViTConfig):
    cfg = MPlugConfig(bert=c, vit=vit_c)
    model = MPlug(cfg)
    rng = np.random.default_rng(0)
    b, a, l, q = 2, 2, 5, 6
    jargs = dict(
        images=jnp.zeros((b, vit_c.image_res, vit_c.image_res, 3),
                         jnp.float32),
        question_ids=jnp.asarray(
            rng.integers(1, c.vocab_size, (b, q)), jnp.int32),
        question_mask=jnp.ones((b, q), jnp.float32),
        answer_ids=jnp.asarray(
            rng.integers(3, c.vocab_size, (b, a, l)), jnp.int32),
        answer_mask=jnp.ones((b, a, l), jnp.float32),
        weights=jnp.ones((b, a), jnp.float32))
    params = model.init(jax.random.PRNGKey(1), **jargs)["params"]
    return model, params, jargs


def _torch_flat_logits(tm: RefMPLUG, jargs, k):
    """The reference composite forward (model_vqa_mplug.py:30-117) down to
    per-answer-slot decoder logits."""
    imgs = np.asarray(jargs["images"])
    ids = np.asarray(jargs["question_ids"])
    mask = np.asarray(jargs["question_mask"])
    answers = np.asarray(jargs["answer_ids"])
    amask = np.asarray(jargs["answer_mask"])
    b = ids.shape[0]
    flat = [(q, s) for q in range(b) for s in range(k[q])]
    t_ans = torch.from_numpy(np.stack([answers[q, s] for q, s in flat])).long()
    t_amask = torch.from_numpy(np.stack([amask[q, s] for q, s in flat]))
    with torch.no_grad():
        image_embeds = tm.visual_encoder.visual(
            torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))),
            skip_last_layer=True, use_checkpoint=False)
        image_atts = torch.ones(image_embeds.size()[:-1], dtype=torch.long)
        text_embeds = tm.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask),
            return_dict=True).last_hidden_state
        image_out, question_out = tm.fusion_encoder(
            encoder_embeds=text_embeds,
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts, return_dict=False)
        question_output = torch.cat([image_out, question_out], 1)
        merge_atts = torch.cat([image_atts.float(),
                                torch.from_numpy(mask)], 1)
        q_states = torch.stack([question_output[q] for q, _ in flat], 0)
        q_atts = torch.stack([merge_atts[q] for q, _ in flat], 0)
        out = tm.text_decoder(
            t_ans, attention_mask=t_amask, encoder_hidden_states=q_states,
            encoder_attention_mask=q_atts, return_dict=True, is_decoder=True)
    return out.logits.numpy()


@pytest.mark.parametrize("ckpt_res", [32, 64])
def test_import_parity_vs_reference_block(tmp_path, ckpt_res):
    """Fabricated pretrain-format checkpoint at `ckpt_res` loaded into a
    32-res model: reference block vs our import must agree on every decoder
    logit (matching resolution AND the bilinear pos-embed resize path)."""
    from crvqa_tpu.core.torch_compat import load_mplug_torch_checkpoint

    c = MPlugBertConfig.tiny(fusion_layers=3, stride_layer=2)
    target_vit = ViTConfig.tiny()  # image_res 32
    torch.manual_seed(0)
    src = RefMPLUG(c, ViTConfig.tiny(image_res=ckpt_res))
    path = str(tmp_path / "mplug_base.pth")
    torch.save({"model": _pretrain_format_sd(src)}, path)

    # --- reference side: exec the literal load block ---
    torch.manual_seed(1)  # different init: everything must come from ckpt
    tm = _run_reference_block(path, RefMPLUG(c, target_vit), 32)

    # --- our side ---
    model, template, jargs = _flax_template(c, target_vit)
    params, params_m, report = load_mplug_torch_checkpoint(
        path, template, pretrain_format=True)
    assert params_m is None
    # every template leaf must be covered by the checkpoint
    assert report["missing"] == [], report["missing"]
    # dropped noise: CLIP text tower, visual.proj, tied decoder head
    assert any("token_embedding" in k for k in report["unused"])
    assert any("cls.predictions.decoder" in k for k in report["unused"])

    # resized pos-embed matches the reference's bilinear resize bit-for-bit
    np.testing.assert_array_equal(
        np.asarray(params["visual_encoder"]["positional_embedding"]),
        tm.visual_encoder.visual.positional_embedding.detach().numpy())

    k = [2, 1]
    ref_logits = _torch_flat_logits(tm, jargs, k)
    ours = MPlug(MPlugConfig(bert=c, vit=target_vit)).apply(
        {"params": params}, jargs["images"], jargs["question_ids"],
        jargs["question_mask"], jargs["answer_ids"], jargs["answer_mask"],
        deterministic=True, method=MPlug.answer_logits)
    ours = np.asarray(ours).reshape(2, 2, *ours.shape[1:])
    flat_ours = np.stack([ours[q, s] for q in range(2) for s in range(k[q])])
    np.testing.assert_allclose(flat_ours, ref_logits, rtol=2e-4, atol=2e-4)


def test_twin_import_and_finetuned_format(tmp_path):
    """`_m` momentum twins load into params_m (with the pos resize applied
    to the twin tower as well, vqa_mplug.py:357-366); finetuned-format
    checkpoints (mask/eval modes) bypass resize + shim entirely."""
    from crvqa_tpu.core.torch_compat import (
        flax_to_torch_state_dict, load_mplug_torch_checkpoint)

    c = MPlugBertConfig.tiny(fusion_layers=3, stride_layer=2)
    vit_c = ViTConfig.tiny()
    model, template, _ = _flax_template(c, vit_c)

    torch.manual_seed(2)
    src = RefMPLUG(c, ViTConfig.tiny(image_res=64))
    sd = _pretrain_format_sd(src)
    twin = {}
    for k, v in list(sd.items()):
        tower = k.split(".", 1)[0]
        if tower in ("visual_encoder", "text_encoder", "fusion_encoder",
                     "text_decoder"):
            twin[tower + "_m." + k[len(tower) + 1:]] = v * 0.5
    sd.update(twin)
    path = str(tmp_path / "with_twins.pth")
    torch.save({"module": sd}, path)  # the 'module' unwrap arm (:342)

    params, params_m, report = load_mplug_torch_checkpoint(
        path, template, template_m=template, pretrain_format=True)
    assert params_m is not None and report.get("missing_m") == []
    # twins are the 0.5-scaled towers; compare a non-resized leaf
    np.testing.assert_allclose(
        np.asarray(params_m["text_encoder"]["layer_0"]["attention"]["self"]
                   ["query"]["kernel"]),
        0.5 * np.asarray(params["text_encoder"]["layer_0"]["attention"]
                         ["self"]["query"]["kernel"]), rtol=1e-6)
    # twin pos-embed went through the same resize (5 rows at res 32)
    assert np.asarray(
        params_m["visual_encoder"]["positional_embedding"]).shape[0] == 5

    # finetuned format: our own export round-trips without shims
    rng_params = template
    sd2 = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
           flax_to_torch_state_dict(rng_params).items()}
    # our generic names ARE the reference finetuned names except the towers
    # covered by _mplug_remap_key's inverse; write them reference-style
    ref_style = {}
    for k, v in sd2.items():
        if k.startswith("visual_encoder."):
            k = ("visual_encoder.visual."
                 + k[len("visual_encoder."):]
                 .replace("resblocks.", "transformer.resblocks.")
                 .replace(".ln.1.", ".ln_1.")
                 .replace(".ln.2.", ".ln_2.")
                 .replace(".attn_in_proj.weight", ".attn.in_proj_weight")
                 .replace(".attn_in_proj.bias", ".attn.in_proj_bias")
                 .replace(".attn_out_proj.", ".attn.out_proj.")
                 .replace(".mlp_c_fc.", ".mlp.c_fc.")
                 .replace(".mlp_c_proj.", ".mlp.c_proj."))
        elif k.startswith(("text_encoder.layer.", "fusion_encoder.layer.")):
            t, rest = k.split(".", 1)
            k = f"{t}.encoder.{rest}"
        elif k.startswith("text_decoder."):
            rest = k[len("text_decoder."):]
            if rest.startswith("embeddings."):
                rest = "bert." + rest
            elif rest.startswith("layer."):
                rest = "bert.encoder." + rest
            elif rest == "predictions_bias":
                rest = "cls.predictions.bias"
            elif rest.startswith("predictions_transform_dense."):
                rest = ("cls.predictions.transform.dense."
                        + rest.rsplit(".", 1)[-1])
            elif rest.startswith("predictions_transform_LayerNorm."):
                rest = ("cls.predictions.transform.LayerNorm."
                        + rest.rsplit(".", 1)[-1])
            k = "text_decoder." + rest
        ref_style[k] = v
    path2 = str(tmp_path / "finetuned.pth")
    torch.save({"model": ref_style}, path2)
    params2, _, report2 = load_mplug_torch_checkpoint(
        path2, template, pretrain_format=False)
    assert report2["missing"] == [], report2["missing"][:5]
    jax.tree_util.tree_map(np.testing.assert_array_equal, params2,
                           jax.tree_util.tree_map(np.asarray, template))


@pytest.mark.slow
def test_cli_init_ckpt_wiring(tmp_path, monkeypatch):
    """`--init_ckpt base.pth` routes through `common.load_params_any` into
    the mPLUG torch importer with the pretrain shims auto-enabled for
    full-mode training (the reference gate, vqa_mplug.py:346), and the
    tiny driver trains from it end to end."""
    from crvqa_tpu.cli import vqa_mplug
    from crvqa_tpu.core import torch_compat

    c = MPlugBertConfig.tiny()
    torch.manual_seed(3)
    src = RefMPLUG(c, ViTConfig.tiny(image_res=64))
    path = str(tmp_path / "base.pth")
    torch.save({"model": _pretrain_format_sd(src)}, path)

    calls = {}
    real = torch_compat.load_mplug_torch_checkpoint

    def spy(p, template, **kw):
        out = real(p, template, **kw)
        calls["report"] = out[2]
        calls["pretrain_format"] = kw.get("pretrain_format")
        return out

    monkeypatch.setattr(torch_compat, "load_mplug_torch_checkpoint", spy)
    out = tmp_path / "out"
    vqa_mplug.main([
        "--output_dir", str(out), "--tiny", "--synthetic", "16",
        "--mode", "full", "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--logging_steps", "2",
        "--warmup_steps", "1", "--dtype", "float32", "--do_train",
        "--seed", "0", "--init_ckpt", path,
    ])
    assert calls["pretrain_format"] is True
    assert calls["report"]["missing"] == [], calls["report"]["missing"][:5]


def test_strip_fusion_bert_quirk():
    """The shim's exact dict semantics incl. the set-then-del self-rename
    DELETE (vqa_mplug.py:367-371)."""
    from crvqa_tpu.core.torch_compat import strip_fusion_bert_keys

    sd = {
        "text_encoder.bert.encoder.layer.0.w": 1,
        "fusion_encoder.fusion.encoder.layer.6.w": 2,
        "text_decoder.bert.encoder.layer.0.w": 3,     # 'decode' -> untouched
        "visual_encoder.visual.conv1.weight": 4,      # no match -> untouched
        "fusion_encoder.encoder.layer.7.w": 5,        # self-rename -> DELETED
    }
    out = strip_fusion_bert_keys(sd)
    assert out == {
        "text_encoder.encoder.layer.0.w": 1,
        "fusion_encoder.encoder.layer.6.w": 2,
        "text_decoder.bert.encoder.layer.0.w": 3,
        "visual_encoder.visual.conv1.weight": 4,
    }


def test_vit_l_large_adapter():
    """ViT-L preset: width-1024 tower + the visn_fc/visn_layer_norm 'large'
    adapter (model_vqa_mplug.py:143-147) appear in the tree, load from
    checkpoint keys, and change the encode path's output width to
    hidden_size."""
    from crvqa_tpu.core.torch_compat import load_mplug_torch_checkpoint

    assert ViTConfig.vit_l_14().width == 1024
    assert ViTConfig.vit_l_14().patch_size == 14

    c = MPlugBertConfig.tiny(fusion_layers=3, stride_layer=2)
    vit_c = ViTConfig.tiny(width=64, heads=4)  # != hidden_size -> 'large'
    model, template, jargs = _flax_template(c, vit_c)
    assert "visn_fc" in template and "visn_layer_norm" in template

    # a checkpoint carrying the adapter keys fills them
    import torch.nn as nn
    fc = nn.Linear(64, c.hidden_size)
    ln = nn.LayerNorm(c.hidden_size)
    sd = {"visn_fc.weight": fc.weight.detach(),
          "visn_fc.bias": fc.bias.detach(),
          "visn_layer_norm.weight": ln.weight.detach() * 2,
          "visn_layer_norm.bias": ln.bias.detach()}
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "adapter.pth")
        torch.save({"model": sd}, p)
        params, _, report = load_mplug_torch_checkpoint(
            p, template, pretrain_format=False)
    np.testing.assert_allclose(
        np.asarray(params["visn_fc"]["kernel"]),
        fc.weight.detach().numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["visn_layer_norm"]["scale"]), 2.0, rtol=1e-6)

    states, smask = MPlug(MPlugConfig(bert=c, vit=vit_c)).apply(
        {"params": params}, jargs["images"], jargs["question_ids"],
        jargs["question_mask"], deterministic=True, method=MPlug.encode)
    assert states.shape[-1] == c.hidden_size
