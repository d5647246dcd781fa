"""Every CLI's parser constructs and parses a minimal argv — guards the
duplicate-flag class (argparse.ArgumentError fires at add_argument time;
serve_mplug once re-added --device_normalize it inherits from
vqa_mplug.build_parser and was unusable until the first manual run)."""
import importlib

import pytest

# (cli module, minimal argv). prune_debias_vqavs is a parser-reuse
# delegate of prune_debias_vqa (no build_parser of its own).
CLIS = [
    ("run_vqa_stage1", ["--output_dir", "/tmp/x"]),
    ("run_vqa_stage3", ["--output_dir", "/tmp/x"]),
    ("prune_debias_vqa", ["--output_dir", "/tmp/x"]),
    ("prune_debias_vqa_visualbert", ["--output_dir", "/tmp/x"]),
    ("vqa_mplug", ["--output_dir", "/tmp/x"]),
    ("serve_vqa", ["--dataroot", "/tmp/d", "--img_root", "/tmp/i"]),
    ("serve_mplug", ["--output_dir", "/tmp/x"]),
]


@pytest.mark.parametrize("name,argv", CLIS, ids=[c[0] for c in CLIS])
def test_build_parser_constructs_and_parses(name, argv):
    mod = importlib.import_module(f"crvqa_tpu.cli.{name}")
    args = mod.build_parser().parse_args(argv)
    assert args is not None
