"""Class-free loading of reference whole-module pickles.

The reference's stage-1 checkpoints and `classifier4masker.bin` are
`torch.save(model)` WHOLE-MODULE pickles (`mask_trainer_Robust_VQA.py:
734-740,748-755`); unpickling them normally needs the reference class
definitions. `core.torch_compat.module_pickle_state_dict` fabricates stub
classes instead and walks the module tree into a state_dict — these tests
prove the result equals the real module's own state_dict() on the ACTUAL
reference model, and that the CLI loaders fall back to it when the pickled
classes are unimportable.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.core import torch_compat
from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.models import LxmertConfig, LxmertForVQA

torch = ref_oracle.install()


def _tiny_ref_model():
    """The actual reference LxmertForMultipleChoice at tiny config."""
    from hg_transformers.configuration_lxmert import LxmertConfig as TorchCfg
    from hg_transformers.modeling_lxmert import LxmertForMultipleChoice

    config = LxmertConfig.tiny()
    tcfg = TorchCfg(
        vocab_size=config.vocab_size, hidden_size=config.hidden_size,
        num_attention_heads=config.num_attention_heads,
        l_layers=config.l_layers, r_layers=config.r_layers,
        x_layers=config.x_layers, intermediate_size=config.intermediate_size,
        visual_feat_dim=config.visual_feat_dim,
        visual_pos_dim=config.visual_pos_dim,
        max_position_embeddings=config.max_position_embeddings,
        hidden_act=config.hidden_act,
    )
    tcfg.ans_num = config.ans_num
    return config, LxmertForMultipleChoice(tcfg)


def _assert_state_dicts_equal(got: dict, want: dict):
    assert set(got) == set(want), (
        f"missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}")
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k].detach() if hasattr(got[k], "detach") else got[k]),
            want[k].detach().numpy(), err_msg=k)


def test_reference_whole_model_pickle_stub_load(tmp_path):
    """torch.save(reference model) -> stub unpickler -> state_dict identical
    to the module's own state_dict(), with zero reference imports at load
    time (the allowlist stubs hg_transformers classes even though they ARE
    importable in this test process)."""
    _, tm = _tiny_ref_model()
    path = str(tmp_path / "t_FTonly.bin")
    torch.save(tm, path)

    state = torch_compat.module_pickle_state_dict(path)
    _assert_state_dicts_equal(state, tm.state_dict())


def test_reference_classifier_module_pickle(tmp_path):
    """classifier4masker.bin saved as the reference does (the whole
    weight-normed SimpleClassifier module) reads back tensor-identical."""
    from hg_transformers.classifier import SimpleClassifier

    clf = SimpleClassifier(16, 32, 7, "weight", "ReLU", 0.5)
    path = str(tmp_path / "classifier4masker.bin")
    torch.save(clf, path)

    state = torch_compat.module_pickle_state_dict(path)
    # weight_norm parameterization must survive: weight_g/weight_v entries
    assert any(k.endswith("weight_g") for k in state)
    _assert_state_dicts_equal(state, clf.state_dict())


class _GhostModel(torch.nn.Module):
    """Pickles under a fake module name the loader can never import."""

    def __init__(self):
        super().__init__()
        self.dense = torch.nn.Linear(4, 3)


def test_load_torch_params_fallback_unimportable_class(tmp_path):
    """load_torch_params on a whole-module pickle whose class is NOT
    importable (the production case: reference checkpoints, no reference
    code installed) recovers via the stub fallback and fills the flax
    template."""
    import sys
    import types

    mod = types.ModuleType("ghost_pkg_for_pickle_test")
    _GhostModel.__module__ = mod.__name__
    _GhostModel.__qualname__ = "GhostModel"
    mod.GhostModel = _GhostModel
    sys.modules[mod.__name__] = mod
    m = _GhostModel()
    path = str(tmp_path / "ghost.bin")
    torch.save(m, path)
    del sys.modules[mod.__name__]

    with pytest.raises((ModuleNotFoundError, AttributeError)):
        torch.load(path, map_location="cpu", weights_only=False)

    template = {"dense": {"kernel": np.zeros((4, 3), np.float32),
                          "bias": np.zeros((3,), np.float32)}}
    got = torch_compat.load_torch_params(path, template)
    np.testing.assert_allclose(got["dense"]["kernel"],
                               m.dense.weight.detach().numpy().T)
    np.testing.assert_allclose(got["dense"]["bias"],
                               m.dense.bias.detach().numpy())


def test_dataparallel_module_prefix_stripped(tmp_path):
    """A DataParallel-style `module.`-wrapped save loads with the prefix
    stripped (every key uniformly prefixed -> unwrap)."""
    wrapper = torch.nn.Module()
    wrapper.module = torch.nn.Linear(4, 3)
    path = str(tmp_path / "dp.bin")
    torch.save(wrapper, path)

    state = torch_compat.module_pickle_state_dict(path)
    assert set(state) == {"weight", "bias"}


def test_end_to_end_reference_pickle_into_flax(tmp_path):
    """Full interop: reference whole-module stage-1 pickle -> flax params ->
    forward produces the reference model's logits (the switch-over path a
    reference user takes with their existing .bin files)."""
    config, tm = _tiny_ref_model()
    tm.eval()
    path = str(tmp_path / "t_FTonly.bin")
    torch.save(tm, path)

    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=2, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    template = model.init(jax.random.PRNGKey(0), input_ids=jb["input_ids"],
                          visual_feats=jb["visual_feats"],
                          visual_pos=jb["visual_pos"])["params"]

    state = torch_compat.module_pickle_state_dict(path)
    params = torch_compat.torch_state_dict_to_flax(state, template)

    logits, _ = model.apply(
        {"params": params}, input_ids=jb["input_ids"],
        visual_feats=jb["visual_feats"], visual_pos=jb["visual_pos"],
        attention_mask=jb["attention_mask"], deterministic=True)

    with torch.no_grad():
        _, t_logits, _ = tm(
            input_ids=torch.from_numpy(np.asarray(b["input_ids"])),
            visual_feats=torch.from_numpy(np.asarray(b["visual_feats"],
                                                     np.float32)),
            visual_pos=torch.from_numpy(np.asarray(b["visual_pos"],
                                                   np.float32)),
            attention_mask=torch.from_numpy(np.asarray(b["attention_mask"],
                                                       np.float32)),
            token_type_ids=torch.zeros_like(
                torch.from_numpy(np.asarray(b["input_ids"]))),
            labels=torch.from_numpy(np.asarray(b["labels"], np.float32)))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_non_persistent_buffers_excluded(tmp_path):
    """state_dict() omits persistent=False buffers; the stub walk must too
    (divergence would feed phantom keys to key-set consumers)."""
    m = torch.nn.Module()
    m.lin = torch.nn.Linear(2, 2)
    m.lin.register_buffer("scratch", torch.ones(3), persistent=False)
    m.lin.register_buffer("kept", torch.ones(3), persistent=True)
    path = str(tmp_path / "buf.bin")
    torch.save(m, path)

    state = torch_compat.module_pickle_state_dict(path)
    assert set(state) == set(m.state_dict().keys())
    assert "lin.scratch" not in state and "lin.kept" in state
