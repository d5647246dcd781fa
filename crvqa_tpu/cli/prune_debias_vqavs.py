"""Stage-2 driver for LXMERT on VQA-VS (`prune_debias_VQAvs.py`).

Identical masking machinery to `prune_debias_vqa`; data comes from the
VQA-VS splits (`dataset_LXM_VQAvs.py`) and the post-train prediction dump is
additionally written under the reference's (typo'd, kept for compat)
`prefictions_VQAvs_test.json` name (`prune_debias_VQAvs.py:1031-1061`);
scoring goes through `crvqa_tpu.evals.compute_vqavs_scores`.
"""
from __future__ import annotations

import os
import shutil

from . import prune_debias_vqa


def main(argv=None) -> None:
    parser = prune_debias_vqa.build_parser()
    parser.set_defaults(dataset="vqavs")
    args = parser.parse_args(argv)
    prune_debias_vqa.run(args)
    test_json = os.path.join(args.output_dir, "test.json")
    if os.path.exists(test_json):
        shutil.copy(test_json,
                    os.path.join(args.output_dir, "prefictions_VQAvs_test.json"))


if __name__ == "__main__":
    main()
