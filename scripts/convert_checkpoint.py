"""CLI for the torch/HF → npz BERT-CRF checkpoint converter.

Usage:
  python scripts/convert_checkpoint.py SRC_DIR DST_DIR [--num-heads N]

SRC_DIR is a reference-style ``save_pretrained`` directory
(``pytorch_model.bin`` + ``config.json`` + ``vocab.txt`` [+
``tokenizer_config.json``]); DST_DIR receives the ``weights.npz`` layout
``BertCrfModel.from_pretrained`` loads. No torch required.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src_dir")
    ap.add_argument("dst_dir")
    ap.add_argument(
        "--num-heads",
        type=int,
        help="attention heads (default: config num_attention_heads, else "
        "max(1, hidden//64))",
    )
    args = ap.parse_args()

    from indian_address_parser_spark.operators.checkpoint_convert import (
        convert_checkpoint,
    )

    out = convert_checkpoint(args.src_dir, args.dst_dir, num_heads=args.num_heads)
    print(out)


if __name__ == "__main__":
    main()
