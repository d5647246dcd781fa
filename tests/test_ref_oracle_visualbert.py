"""Reference-oracle parity: VisualBERT forward vs
`hg_transformers/modeling_visualbert.py` (VisualBertForMultipleChoice:1021,
VisualBertEmbeddings:77-205) with transplanted tiny-config flax params."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.models.visualbert import VisualBertConfig, VisualBertForVQA

torch = ref_oracle.install()


@pytest.fixture(scope="module")
def tiny_vb():
    config = VisualBertConfig.tiny()
    model = VisualBertForVQA(config)
    rng = np.random.default_rng(1)
    b, seq, vis = 3, 7, 4
    batch = {
        "input_ids": rng.integers(1, config.vocab_size, (b, seq)).astype(np.int32),
        "visual_embeds": rng.normal(size=(b, vis, config.visual_embedding_dim)).astype(np.float32),
        "attention_mask": np.ones((b, seq), np.float32),
    }
    batch["attention_mask"][:, -2:] = 0.0
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jnp.asarray(batch["input_ids"]),
                        visual_embeds=jnp.asarray(batch["visual_embeds"]))["params"]
    return config, model, params, batch


def test_visualbert_forward_parity(tiny_vb):
    config, model, params, batch = tiny_vb
    from hg_transformers.configuration_visualbert import (
        visualBERTConfig as TorchCfg)
    from hg_transformers.modeling_visualbert import VisualBertForMultipleChoice

    tcfg = TorchCfg(
        vocab_size=config.vocab_size, hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        intermediate_size=config.intermediate_size,
        max_position_embeddings=config.max_position_embeddings,
        visual_embedding_dim=config.visual_embedding_dim,
        hidden_act=config.hidden_act,
        special_visual_initialize=False,
    )
    tcfg.ans_num = config.ans_num
    tm = VisualBertForMultipleChoice(tcfg)
    tm.eval()
    # position_ids is a registered buffer, not a param (modeling_visualbert.py:93)
    ref_oracle.load_flax_into_torch(tm, params,
                                    allow_missing=("position_ids",))

    logits, pooled = model.apply(
        {"params": params}, input_ids=jnp.asarray(batch["input_ids"]),
        visual_embeds=jnp.asarray(batch["visual_embeds"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        deterministic=True)

    with torch.no_grad():
        out = tm(
            input_ids=torch.from_numpy(batch["input_ids"]).long(),
            attention_mask=torch.from_numpy(batch["attention_mask"]),
            token_type_ids=torch.zeros_like(
                torch.from_numpy(batch["input_ids"]).long()),
            visual_embeds=torch.from_numpy(batch["visual_embeds"]),
            visual_attention_mask=torch.ones(
                batch["visual_embeds"].shape[:-1]),
        )
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               rtol=2e-5, atol=2e-5)
