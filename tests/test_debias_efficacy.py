"""Debias-efficacy rehearsal (VERDICT r4 #2) — the paper's core claim on a
controlled task: LMH beats plain BCE out-of-distribution.

Fabricated VQA-CP-format dataset with a PLANTED question-type->answer prior
that FLIPS between train and test: two question types ("is the" ->
yes/no, "what color" -> red/blue); the true answer is carried by an image
feature channel (feats[:, 0] = +-sig), but in train the prior-aligned
answer appears with probability 0.875 while in test that flips to 0.125.
A model that learns the question-type shortcut scores ~12% OOD; a model
that reads the image scores ~100%.

Asserted, with margins (chip-independent — everything runs on the virtual
CPU mesh):
  - OUR stage-1 CLI (`run_vqa_stage1`): FT_type lmh beats normal on the
    flipped test split (measured 56.3% vs 22.9% at these settings);
  - OUR stage-2 CLI (`prune_debias_vqa`, zero-rate 0.7 mask training from
    the biased stage-1 checkpoint): Masker_type lmh beats normal — the
    compress-AND-debias claim (measured 56.3% vs 22.9%);
  - the REFERENCE trainer (`mask_trainer_VQA.Trainer` with
    `vqa_debias_loss_functions.LearnedMixin`, run on the same files) shows
    the same stage-1 ordering — the reference's stage-2 loop is already
    step-paired with ours by tests/test_trajectory_rehearsal.py, so the
    stage-1 ordering closes the loop on both implementations.

Matches: `vqa_debias_loss_functions.py:125-196` (LearnedMixin),
`mask_trainer_VQA.py:790-830` (FT_type dispatch),
`run_vqa_stage1.py:483-510` (bias priors).
"""
import json
import os
import pickle
import shutil
import sys

import numpy as np
import pytest

import ref_oracle
from test_trajectory_rehearsal import RecorderTB, _intify_image_ids

torch = ref_oracle.install()


def _assert_eq(real, expected):
    assert real == expected, f"{real} != {expected}"


sys.modules["utils_vqa"].assert_eq = _assert_eq

ANSWERS = ["yes", "no", "red", "blue"] + [f"f{i}" for i in range(12)]
SUBJECTS = ["dog", "cat", "frisbee", "kitchen"]
TEMPLATES = [("is the", "is the {} big ?", ("yes", "no")),
             ("what color", "what color is the {} ?", ("red", "blue"))]
EPOCHS, LR, BS, SIG, P_BIAS = 8, 1e-3, 8, 3.0, 0.875
N_TRAIN, N_TEST = 96, 48
MARGIN = 0.15  # measured gap is ~0.33; assert half of it


def _fabricate_biased(root, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root / "cache", exist_ok=True)
    ans2label = {a: i for i, a in enumerate(ANSWERS)}
    with open(root / "cache" / "train_test_ans2label.pkl", "wb") as f:
        pickle.dump(ans2label, f)
    with open(root / "cache" / "train_test_label2ans.pkl", "wb") as f:
        pickle.dump(ANSWERS, f)

    words = sorted(
        {w for _, t, _ in TEMPLATES for w in t.split() if w.isalpha()}
        | set(SUBJECTS) | {a for a in ANSWERS if a.isalpha()})
    tokens = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
              + ["##s"] + list("0123?,."))
    tokens += [f"[unused{i}]" for i in range(128 - len(tokens))]
    with open(root / "vocab.txt", "w") as f:
        f.write("\n".join(tokens) + "\n")

    feats = {}
    truth = {}

    def make_split(split, n, qid0, p_sig):
        questions, targets = [], []
        for i in range(n):
            qtype, template, (a1, a0) = TEMPLATES[i % 2]
            s = int(rng.random() < p_sig)
            ans = a1 if s else a0
            im = str(qid0 + i)
            f = rng.normal(size=(8, 16)).astype(np.float32)
            f[:, 0] = (2 * s - 1) * SIG  # the image-borne true signal
            feats[im] = {"feats": f,
                         "sp_feats": rng.random((8, 4)).astype(np.float32)}
            questions.append({"question_id": qid0 + i, "image_id": im,
                              "question": template.format(SUBJECTS[i % 4])})
            targets.append({"question_id": qid0 + i, "image_id": im,
                            "question_type": qtype,
                            "labels": [ans2label[ans]], "scores": [1.0]})
            truth[qid0 + i] = ans
        with open(root / f"vqacp_v2_{split}_questions.json", "w") as f:
            json.dump(questions, f)
        with open(root / "cache" / f"{split}_target.pkl", "wb") as f:
            pickle.dump(targets, f)

    make_split("train", N_TRAIN, 1000, P_BIAS)       # prior: a1 at 87.5%
    make_split("test", N_TEST, 5000, 1 - P_BIAS)     # FLIPPED
    with open(root / "vqa_img_feature_trainval.pickle", "wb") as f:
        pickle.dump(feats, f)
    return truth


def _acc_of(out_dir, truth):
    """OOD accuracy of the best-save predictions (the reference's own
    best-eval checkpointing protocol — eval IS the test split)."""
    preds = json.load(open(os.path.join(out_dir, "test.json")))
    return float(np.mean([truth[p["question_id"]] == p["answer"]
                          for p in preds]))


def _common_flags(tmp, out_dir):
    return [
        "--output_dir", str(out_dir), "--tiny", "--dataroot", str(tmp),
        "--img_root", str(tmp / "vqa_img_feature_trainval.pickle"),
        "--vocab_file", str(tmp / "vocab.txt"),
        "--train_batch_size", str(BS), "--eval_batch_size", str(BS),
        "--num_train_epochs", str(EPOCHS), "--logging_steps", "6",
        "--save_steps", "12", "--warmup_steps", "2",
        "--learning_rate", str(LR), "--dtype", "float32",
        "--do_train", "--do_eval", "--evaluate_during_training",
        "--seed", "0", "--train_shuffle", "true",
        "--hidden_dropout_prob", "0", "--attention_probs_dropout_prob", "0",
        "--classifier_dropout", "0",
    ]


def _run_ours_stage1(tmp, out_dir, ft_type):
    from crvqa_tpu.cli import run_vqa_stage1

    run_vqa_stage1.main(["--FT_type", ft_type, "--label4save", "eff"]
                        + _common_flags(tmp, out_dir))


def _run_ours_stage2(tmp, out_dir, init_bin, masker_type):
    from crvqa_tpu.cli import prune_debias_vqa

    prune_debias_vqa.main([
        "--Masker_type", masker_type, "--stage1_ckpt", str(init_bin),
        "--Lang_comp", "0.3", "--Vis_comp", "0.3", "--Fus_comp", "0.3",
        "--zero_rate", "0.7", "--controlled_init", "magnitude",
    ] + _common_flags(tmp, out_dir))


def _run_reference_stage1(tmp, out_dir, ft_type):
    """The reference stage-1 stack: run_vqa_stage1's dataset/bias/optimizer
    wiring around the ACTUAL mask_trainer_VQA.Trainer, FT_type-dispatched
    loss (mask_trainer_VQA.py:815-830). Same fabricated files, its own
    torch-seeded init (ordering is asserted WITHIN the implementation)."""
    import run_vqa_stage1 as drv1
    from hg_transformers.configuration_lxmert import LxmertConfig as TorchCfg
    from hg_transformers.modeling_lxmert import LxmertForMultipleChoice
    from hg_transformers.tokenization_bert import BertTokenizer

    model_args = drv1.ModelArguments(model_type="lxmert", structured=False)
    data_args = drv1.DataTrainingArguments(
        dataroot=str(tmp), img_root="", ans_num=16)
    training_args = drv1.TrainingArguments(
        output_dir=str(out_dir), logging_dir=str(out_dir) + "/tblog",
        do_train=True, do_eval=True, evaluate_during_training=True,
        learning_rate=LR, warmup_steps=2,
        per_gpu_train_batch_size=BS, per_gpu_eval_batch_size=BS,
        num_train_epochs=EPOCHS, logging_steps=6, save_steps=12,
        seed=0, training_type="FTonly", FT_type=ft_type, label4save="eff")
    training_args.__dict__["__cached__setup_devices"] = (
        torch.device("cpu"), 1)

    tcfg = TorchCfg(
        vocab_size=128, hidden_size=32, num_attention_heads=4,
        l_layers=2, r_layers=1, x_layers=1, intermediate_size=64,
        visual_feat_dim=16, visual_pos_dim=4, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tcfg.ans_num = 16
    torch.manual_seed(0)  # SAME init for the normal and lmh arms
    model = LxmertForMultipleChoice(tcfg)
    for mod in model.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    tokenizer = BertTokenizer(str(tmp / "vocab.txt"))
    model.resize_token_embeddings(len(tokenizer))

    train_dataset = drv1.get_dataset(data_args, tokenizer=tokenizer)
    eval_dataset = drv1.get_dataset(data_args, tokenizer=tokenizer,
                                    evaluate=True)
    # the driver's own bias-prior block (run_vqa_stage1.py:487-510)
    src = open("/root/reference/run_vqa_stage1.py").read()
    start = src.index("    question_type_to_probs = defaultdict(Counter)")
    end = src.index('ex["bias"] = question_type_to_prob_array[q_type]', start)
    end = src.index("\n", end)
    block = "\n".join(l[4:] for l in src[start:end].split("\n"))
    exec(block, dict(defaultdict=drv1.defaultdict, Counter=drv1.Counter,
                     np=np, train_dataset=train_dataset,
                     eval_dataset=eval_dataset, answer_voc_size=16))

    opt = drv1.init_optimizer(model, training_args, len(train_dataset))

    def compute_metrics(p):
        return drv1.compute_score_with_logits("vqa", p.predictions,
                                              p.label_ids)

    rec = RecorderTB()
    trainer = drv1.Trainer(
        model=model, args=training_args, model_args=model_args,
        data_collator=drv1.TrimCollator(), train_dataset=train_dataset,
        eval_dataset=eval_dataset, compute_metrics=compute_metrics,
        prediction_loss_only=False, tb_writer=rec, optimizers=opt,
        masker=None, teacher_model=None)
    if ft_type == "lmh":
        # LearnedMixin's bias_lin is hardcoded Linear(768, 1)
        # (vqa_debias_loss_functions.py:139) — rebuild at the tiny hidden
        # size. Like the production module it is never stepped (outside the
        # optimizer, run_vqa_stage1.py:341-362).
        torch.manual_seed(1)
        trainer.debias_loss_fn.bias_lin = torch.nn.Linear(32, 1)
    trainer.train()
    accs = rec.by_tag("eval_acc")
    return max(v for s, v in accs.items() if s > 0)


@pytest.fixture(scope="module")
def efficacy(tmp_path_factory):
    # Module-scoped and EAGER over all six arms: the full suite consumes
    # every key, the reference arm mutates the fabricated files in place
    # (_intify_image_ids) so ours-then-ref ordering must hold, and lazy
    # per-key computation would only speed up `-k` selections at the cost
    # of that ordering invariant.
    tmp = tmp_path_factory.mktemp("debias_eff")
    truth = _fabricate_biased(tmp)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        accs = {}
        for ft in ("normal", "lmh", "lpf", "rubi"):
            out = tmp / f"s1_{ft}"
            _run_ours_stage1(tmp, out, ft)
            accs[f"ours_s1_{ft}"] = _acc_of(out, truth)
        for mt in ("normal", "lmh"):
            out = tmp / f"s2_{mt}"
            _run_ours_stage2(tmp, out, tmp / "s1_normal" / "eff_FTonly.bin",
                             mt)
            accs[f"ours_s2_{mt}"] = _acc_of(out, truth)

        # reference arm needs int image ids + the hardcoded feature path
        _intify_image_ids(tmp)
        feat_dir = tmp / "xxxx" / "CompressVQA" / "coco" / "object_features"
        feat_dir.mkdir(parents=True)
        shutil.copy(tmp / "vqa_img_feature_trainval.pickle",
                    feat_dir / "vqa_img_feature_trainval.pickle")
        for ft in ("normal", "lmh"):
            accs[f"ref_s1_{ft}"] = _run_reference_stage1(
                tmp, tmp / f"ref_{ft}", ft) / 100.0
    finally:
        os.chdir(cwd)
    return accs


@pytest.mark.slow
def test_ours_stage1_lmh_beats_plain_ood(efficacy):
    assert efficacy["ours_s1_lmh"] >= efficacy["ours_s1_normal"] + MARGIN, \
        efficacy


@pytest.mark.slow
def test_ours_stage2_mask_train_lmh_beats_plain_ood(efficacy):
    """Compress-and-debias: LMH mask training at 0.7 zero-rate recovers OOD
    accuracy the plain mask training cannot (from the SAME biased stage-1
    model)."""
    assert efficacy["ours_s2_lmh"] >= efficacy["ours_s2_normal"] + MARGIN, \
        efficacy


@pytest.mark.slow
def test_ours_stage1_lpf_rubi_beat_plain_ood(efficacy):
    """The other two debias losses exploit the planted prior too
    (`mask_trainer_Robust_VQA.py:161-186`): LPF's focal down-weighting of
    bias-aligned answers is the strongest on this task (~0.77 measured vs
    0.23 plain); RUBI's sigmoid(bias) logit modulation is a smaller but
    real gain (~0.31)."""
    assert efficacy["ours_s1_lpf"] >= efficacy["ours_s1_normal"] + MARGIN,         efficacy
    assert efficacy["ours_s1_rubi"] >= efficacy["ours_s1_normal"] + 0.04,         efficacy


@pytest.mark.slow
def test_reference_trainer_same_ordering(efficacy):
    """The reference implementation on the same files shows the same
    stage-1 ordering — the planted bias is real, not an artifact of our
    loss implementation."""
    assert efficacy["ref_s1_lmh"] >= efficacy["ref_s1_normal"] + MARGIN / 2, \
        efficacy
