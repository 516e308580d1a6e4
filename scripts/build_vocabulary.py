#!/usr/bin/env python
"""Build the caption vocabulary — CLI mirror of
var_updown/scripts/build_vocabulary.py (COCO count ≥ 5 + Senticap combined
count ≥ 2, specials first, AllenNLP file format)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from style_seqcvae_tpu.data.vocabulary import Vocabulary, build_caption_vocabulary

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-c", "--captions-jsonpath", required=True)
parser.add_argument("-s", "--senticap-jsonpath", default="")
parser.add_argument("-t", "--word-count-threshold", type=int, default=5)
parser.add_argument("-st", "--senticap-word-count-threshold", type=int, default=2)
parser.add_argument("-o", "--output-dirpath", required=True)


def main():
    args = parser.parse_args()
    captions = json.load(open(args.captions_jsonpath))["annotations"]
    senticap = (json.load(open(args.senticap_jsonpath))["images"]
                if args.senticap_jsonpath else [])
    tokens = build_caption_vocabulary(
        captions, senticap, args.word_count_threshold,
        args.senticap_word_count_threshold)
    print(f"Caption vocabulary size (with special tokens): {len(tokens)}")
    Vocabulary(tokens).save_to_files(args.output_dirpath)
    print(f"Wrote vocabulary to {args.output_dirpath}")


if __name__ == "__main__":
    main()
