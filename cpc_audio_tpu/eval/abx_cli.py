"""ZeroSpeech ABX evaluation CLI.

Reference: /root/reference/cpc/eval/ABX.py (222 LoC).

Usage:
    python -m cpc_audio_tpu.eval.abx_cli from_checkpoint CKPT ITEM DB [...]
    python -m cpc_audio_tpu.eval.abx_cli from_pre_computed FEATURES [...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..data import find_all_seqs
from ..feature_loader import FeatureModule, build_feature, load_model
from .abx import group_computation as abx_g
from .abx import iterators as abx_it


def reduce_scores(coords: List[tuple], values: List[float],
                  board_size: tuple, n_context_dims: int) -> float:
    """Aggregate the sparse (speaker, phoneA, phoneB, context[, speakerX])
    scores exactly as the reference's sparse-tensor pipeline (ABX.py:44-95):
    mean over contexts, then speakers, then phone pairs."""
    S, p1, p2 = board_size[:3]
    sums = np.zeros((S, p1, p2), np.float64)
    counts = np.zeros((S, p1, p2), np.float64)
    for c, v in zip(coords, values):
        sums[c[0], c[1], c[2]] += v
        counts[c[0], c[1], c[2]] += 1.0
    group_confusion = sums / (1e-8 * (counts == 0) + counts)
    index_speaker = counts > 0
    divisor_speaker = index_speaker.sum(axis=0)
    phone_confusion = group_confusion.sum(axis=0) / (
        1e-8 * (divisor_speaker == 0) + divisor_speaker)
    return float(phone_confusion.sum() / (divisor_speaker > 0).sum())


def abx(feature_function, path_item_file: str,
        seq_list: Sequence[Tuple[str, str]], distance_mode: str,
        step_feature: float, modes: Sequence[str], seq_norm: bool = True,
        max_x_across: int = 5, max_size_group: int = 30,
        seed: int = 0, on_device: bool = False,
        features_iter=None, file_order=None) -> Dict[str, float]:
    """Compute within/across ABX error rates (ABX.py:20-97).

    on_device=True computes the DTW costs with the wavefront scan on the
    default JAX device (ops/dtw_jax.py) instead of the native host kernel.

    features_iter/file_order: stream pre-extracted (file_id, features)
    pairs (any arrival order; segments assembled in file_order) instead
    of calling feature_function per file — the batched-extraction path;
    memory holds only item segments, never whole-file matrices."""
    if features_iter is not None:
        dataset = abx_it.ABXFeatureLoader.from_features_iter(
            path_item_file, file_order, features_iter, step_feature, True)
    else:
        dataset = abx_it.ABXFeatureLoader(path_item_file, seq_list,
                                          feature_function, step_feature,
                                          True)
    distance_function = abx_g.get_distance_function_from_name(distance_mode)
    scores: Dict[str, float] = {}

    if "within" in modes:
        print("Computing ABX within speakers...")
        it = abx_it.ABXWithinGroupIterator(dataset, max_size_group, seed=seed)
        if len(it) == 0:
            print("WARNING: no valid within-speaker triplet groups; skipped")
        else:
            coords, values, board = abx_g.get_abx_scores_dtw_on_group(
                it, distance_function, it.symmetric, on_device=on_device)
            scores["within"] = reduce_scores(coords, values, board, 1)
            print(f"...done. ABX within : {scores['within']}")

    if "across" in modes:
        print("Computing ABX across speakers...")
        it = abx_it.ABXAcrossGroupIterator(dataset, max_size_group,
                                           max_x=max_x_across, seed=seed)
        if len(it) == 0:
            print("WARNING: no valid across-speaker triplet groups; skipped")
        else:
            coords, values, board = abx_g.get_abx_scores_dtw_on_group(
                it, distance_function, it.symmetric, on_device=on_device)
            scores["across"] = reduce_scores(coords, values, board, 2)
            print(f"...done. ABX across : {scores['across']}")

    return scores


def update_base_parser(parser):
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--feature_size", type=float, default=0.01)
    parser.add_argument("--cuda", action="store_true",
                        help="kept for flag parity; distances are host-side")
    parser.add_argument("--mode", type=str, default="all",
                        choices=["all", "within", "across"])
    parser.add_argument("--max_size_group", type=int, default=10)
    parser.add_argument("--max_x_across", type=int, default=5)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--on_device", action="store_true",
                        help="Run DTW on the JAX device (wavefront scan) "
                             "instead of the native host kernel. NOTE: "
                             "measured ~60x SLOWER than the host path "
                             "(58 s vs 0.91 s / 2000 groups) — DTW is "
                             "latency-bound and each padded-shape bucket "
                             "pays a dispatch; the default host OpenMP "
                             "path is recommended (docs/PERFORMANCE.md). "
                             "Kept for deployments with no host BLAS/OpenMP.")


def parse_args(argv):
    base_parser = argparse.ArgumentParser(description="ABX metric")
    subparsers = base_parser.add_subparsers(dest="load")
    p = subparsers.add_parser("from_checkpoint")
    update_base_parser(p)
    p.add_argument("path_checkpoint", type=str)
    p.add_argument("path_item_file", type=str)
    p.add_argument("path_dataset", type=str)
    p.add_argument("--seq_norm", action="store_true")
    p.add_argument("--max_size_seq", default=64000, type=int)
    p.add_argument("--strict", action="store_true")
    p.add_argument("--file_extension", type=str, default=".wav")
    p.add_argument("--get_encoded", action="store_true")
    p.add_argument("--batch_lanes", type=int, default=8,
                   help="extract features for N files at once (lane-packed "
                        "batches, one dispatch per chunk batch — "
                        "feature_loader.build_features_batched; measured "
                        "3.1x faster device-bound and 2.2x wall-clock even "
                        "through the axon remote tunnel, "
                        "docs/PERFORMANCE.md round 5). 1 restores the "
                        "reference's per-file extraction. Ignored with "
                        "--strict (per-file only).")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="override the checkpoint's activation compute dtype "
                        "for extraction (bfloat16 ~doubles TPU MXU "
                        "throughput; features are returned f32 either way). "
                        "Default: the checkpoint's own setting.")

    p = subparsers.add_parser("from_pre_computed")
    update_base_parser(p)
    # deviation: the reference from_pre_computed parser omits
    # path_item_file (ABX.py:150-156) yet main reads args.path_item_file
    # (ABX.py:199), so that mode crashes there; we accept it explicitly.
    p.add_argument("path_item_file", type=str)
    p.add_argument("path_features", type=str)
    p.add_argument("--file_extension", type=str, default=".npy")
    return base_parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.load == "from_checkpoint":
        model, variables, _, _ = load_model([args.path_checkpoint],
                                            compute_dtype=args.compute_dtype)
        # hidden carries across chunks of a file (reference ABX.py:169-170)
        feature_maker = FeatureModule(model, variables,
                                      get_encoded=args.get_encoded,
                                      keep_hidden=True)

        def feature_function(x):
            return build_feature(feature_maker, x, strict=args.strict,
                                 max_size_seq=args.max_size_seq,
                                 seq_norm=args.seq_norm)
        path_dataset = args.path_dataset
        batch_lanes = 1 if args.strict else max(1, args.batch_lanes)
    elif args.load == "from_pre_computed":
        def feature_function(x):
            return np.load(x)
        path_dataset = args.path_features
    else:
        print("usage: abx_cli {from_checkpoint,from_pre_computed} ...")
        return 2

    modes = ["within", "across"] if args.mode == "all" else [args.mode]
    step_feature = 1.0 / args.feature_size

    seq_list, _ = find_all_seqs(path_dataset,
                                extension=args.file_extension)
    seq_list = [(os.path.splitext(os.path.basename(x))[0],
                 os.path.join(path_dataset, x)) for _, x in seq_list]
    if args.debug:
        seq_list = seq_list[:1000]

    features_iter = file_order = None
    if args.load == "from_checkpoint" and batch_lanes > 1:
        # Lane-packed batched extraction (one dispatch per batch of
        # chunks instead of per B=1 chunk); only files the item file
        # references are extracted, matching ABXFeatureLoader's filter.
        # The generator streams into the loader, which keeps only item
        # segments — whole-file feature matrices are never cached.
        files_data, _, _, _ = abx_it.load_item_file(args.path_item_file)
        wanted = [(fid, p) for fid, p in seq_list if fid in files_data]
        print(f"Batched feature extraction: {len(wanted)} files, "
              f"{batch_lanes} lanes")
        from ..feature_loader import build_features_batched
        file_order = [fid for fid, _ in wanted]
        features_iter = ((wanted[i][0], feats)
                         for i, feats in build_features_batched(
                             feature_maker, [p for _, p in wanted],
                             n_lanes=batch_lanes,
                             max_size_seq=args.max_size_seq,
                             seq_norm=args.seq_norm))

    scores = abx(feature_function, args.path_item_file, seq_list, "cosine",
                 step_feature, modes, seq_norm=getattr(args, "seq_norm",
                                                       False),
                 max_x_across=args.max_x_across,
                 max_size_group=args.max_size_group, seed=args.seed,
                 on_device=args.on_device,
                 features_iter=features_iter, file_order=file_order)

    if args.load == "from_checkpoint":
        default_out = os.path.dirname(args.path_checkpoint)
    else:
        default_out = args.path_features
    out_dir = args.out or default_out
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ABX_scores.json"), "w") as f:
        json.dump(scores, f, indent=2)
    with open(os.path.join(out_dir, "ABX_args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
