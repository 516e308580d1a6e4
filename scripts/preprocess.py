#!/usr/bin/env python
"""Offline preprocessing CLI — ports of the reference misc/ scripts.

Subcommands:
  split-senticap    senticap_dataset.json → 6 per-split/sentiment JSONs
  id-maps           coco2senti / senti2coco pickles
  attribute-index   COCO instances + cocottributes pickle → reader pickles
  balanced-captions sentiment-adjective-augmented COCO captions
  att-balanced-captions  COCO-Attributes adjective-augmented COCO captions
  sentiglove        PCA-10 SentiGloVe latent dictionary
"""

import argparse
import json
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("split-senticap")
    p.add_argument("--senticap-json", required=True)
    p.add_argument("--output-dir", required=True)

    p = sub.add_parser("id-maps")
    p.add_argument("--senticap-json", required=True)
    p.add_argument("--output-dir", required=True)

    p = sub.add_parser("attribute-index")
    p.add_argument("--instances-json", nargs="+", required=True)
    p.add_argument("--cocottributes-pkl", required=True)
    p.add_argument("--output-dir", required=True)

    p = sub.add_parser("balanced-captions")
    p.add_argument("--coco-captions", required=True)
    p.add_argument("--senticap-json", required=True)
    p.add_argument("--objects-tsv", required=True)
    p.add_argument("--attribs-pos", nargs="*", default=[])
    p.add_argument("--attribs-neg", nargs="*", default=[])
    p.add_argument("--output-dir", required=True)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser(
        "att-balanced-captions",
        help="misc/prep_coco_att_data.py: insert COCO-Attributes adjectives "
             "into COCO captions from per-image attribute detections")
    p.add_argument("--coco-captions", required=True,
                   help="COCO captions JSON (annotations list)")
    p.add_argument("--attrib-detections", required=True,
                   help="per-image candidates JSON: [{'image_id', "
                        "'candidates': [[obj, [[att, ...], ...]], ...]}, ...]")
    p.add_argument("--objects-tsv", required=True,
                   help="object wordforms TSV (constraint_wordforms_exp.tsv)")
    p.add_argument("--attribs-tsv", required=True,
                   help="attribute wordforms TSV "
                        "(constraint_wordforms_attribs_exp.tsv)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("sentiglove")
    p.add_argument("--glove-txt", required=True)
    p.add_argument("--word-sentiments-json", required=True)
    p.add_argument("--output", default="sentiglove10.pkl")
    p.add_argument("--n-components", type=int, default=10)

    args = parser.parse_args()
    from style_seqcvae_tpu import preprocessing as pp

    if args.cmd == "split-senticap":
        senticap = json.load(open(args.senticap_json))
        out = pp.split_senticap_by_sentiment(senticap)
        os.makedirs(args.output_dir, exist_ok=True)
        for key, data in out.items():
            path = os.path.join(args.output_dir, f"senticap_{key}.json")
            json.dump(data, open(path, "w"))
            print(f"{path}: {len(data['images'])} images, "
                  f"{len(data['annotations'])} captions")

    elif args.cmd == "id-maps":
        senticap = json.load(open(args.senticap_json))
        c2s, s2c = pp.build_senticap_id_maps(senticap)
        os.makedirs(args.output_dir, exist_ok=True)
        pickle.dump(c2s, open(os.path.join(args.output_dir, "coco2senti.pik"), "wb"))
        pickle.dump(s2c, open(os.path.join(args.output_dir, "senti2coco.pik"), "wb"))
        print(f"{len(c2s)} id mappings written")

    elif args.cmd == "attribute-index":
        instances = [json.load(open(p)) for p in args.instances_json]
        with open(args.cocottributes_pkl, "rb") as f:
            cocottributes = pickle.load(f, encoding="latin1")
        pp.build_attribute_index(instances, cocottributes, args.output_dir)
        print(f"attribute index written to {args.output_dir}")

    elif args.cmd == "balanced-captions":
        coco = json.load(open(args.coco_captions))["annotations"]
        senticap = json.load(open(args.senticap_json))
        splits = pp.split_senticap_by_sentiment(senticap)
        wordforms_objects = pp.read_wordform_classes(args.objects_tsv)
        wf_attribs = {"pos": {"words": {w: 0 for w in args.attribs_pos}},
                      "neg": {"words": {w: 0 for w in args.attribs_neg}}}
        os.makedirs(args.output_dir, exist_ok=True)
        outputs = {}
        for pol in ("pos", "neg"):
            caps = sum((splits[f"{s}_{pol}"]["annotations"]
                        for s in ("train", "val", "test")), [])
            objs, attribs, per_obj = pp.analyze_senticap(
                caps, wordforms_objects, wf_attribs)
            other = "neg" if pol == "pos" else "pos"
            blacklist = set(wf_attribs[other]["words"])
            new, _ = pp.generate_balanced_dataset(
                coco, per_obj[pol], objs, blacklist,
                rng=random.Random(args.seed))
            for c in new:
                c["sentiment"] = 1 if pol == "pos" else -1
            outputs[pol] = new
            path = os.path.join(args.output_dir, f"captions_new_{pol}_balanced.json")
            json.dump(new, open(path, "w"))
            print(f"{path}: {len(new)} captions")
        both = outputs["pos"] + outputs["neg"]
        json.dump(both, open(os.path.join(args.output_dir,
                                          "captions_new_balanced.json"), "w"))

    elif args.cmd == "att-balanced-captions":
        coco = json.load(open(args.coco_captions))
        coco = coco["annotations"] if isinstance(coco, dict) else coco
        image_id2attribs = json.load(open(args.attrib_detections))
        wordforms_objects = pp.read_wordform_classes(args.objects_tsv)
        wordforms_attribs = pp.read_wordform_classes(args.attribs_tsv)
        att_counts = pp.analyze_attribs(image_id2attribs)
        new = pp.generate_att_balanced_dataset(
            coco, image_id2attribs, wordforms_objects, wordforms_attribs,
            att_counts, rng=random.Random(args.seed))
        os.makedirs(args.output_dir, exist_ok=True)
        path = os.path.join(args.output_dir, "att_captions_new_balanced.json")
        json.dump(new, open(path, "w"))
        print(f"{path}: {len(new)} captions "
              f"({len(att_counts)} distinct attributes in detections)")

    elif args.cmd == "sentiglove":
        from style_seqcvae_tpu.data.config_attrib_selection import attrib_selection

        word_sentiments = json.load(open(args.word_sentiments_json))
        vectors = {}
        wanted = {k.split(" ")[0] for k in attrib_selection}
        with open(args.glove_txt, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip().split(" ")
                if parts[0] in wanted:
                    vectors[parts[0]] = np.asarray(parts[1:], np.float32)

        def lookup(w):
            return vectors.get(w, np.zeros(300, np.float32))

        table = pp.prep_sentiglove(lookup, word_sentiments, attrib_selection,
                                   args.n_components)
        pickle.dump(table, open(args.output, "wb"))
        print(f"{args.output}: {len(table)} words, {args.n_components} dims")


if __name__ == "__main__":
    main()
