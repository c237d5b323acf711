"""Shared CLI plumbing for the entry-point scripts."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataset", default="mug", choices=["mug", "mhad", "natops"])
    p.add_argument("--data-root", default="", help="frame-folder corpus root")
    p.add_argument(
        "--synthetic", action="store_true",
        help="generate a synthetic corpus under --data-root (or a tmp dir)",
    )
    p.add_argument("--log-dir", default="log")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--platform", default="", help="force jax platform (e.g. cpu)")
    return p


def setup_platform(args) -> None:
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)


def resolve_data_root(args, image_size: int = 128) -> str:
    from cvpr23_lfdm_tpu.data.synthetic import make_synthetic_corpus

    root = args.data_root
    if args.synthetic:
        if not root:
            import tempfile

            root = tempfile.mkdtemp(prefix=f"{args.dataset}_synth_")
        if (not os.listdir(root)) if os.path.isdir(root) else True:
            os.makedirs(root, exist_ok=True)
            size = max(image_size, 320 if args.dataset == "natops" else image_size)
            from cvpr23_lfdm_tpu.data.specs import get_spec

            spec = get_spec(args.dataset)
            # cover BOTH splits so train and eval entry points work
            subjects = list(spec.train_subjects[:2]) + list(spec.test_subjects[:2])
            make_synthetic_corpus(
                root, args.dataset, num_frames=16, size=size, seed=args.seed,
                subjects=subjects, classes=None, takes=2,
            )
        print(f"synthetic corpus at {root}")
    if not root:
        raise SystemExit("--data-root required (or pass --synthetic)")
    return root


def load_text_embedder(dataset: str):
    """Cached BERT class-text table; fall back to a deterministic random
    table when HF weights are unavailable (no egress)."""
    from cvpr23_lfdm_tpu.models.text import DATASET_CLASSES, TextEmbedder

    try:
        return TextEmbedder.build(dataset)
    except Exception as e:  # no cache and no downloadable BERT
        print(f"warning: BERT embeddings unavailable ({e}); using random table")
        return TextEmbedder.random_for_testing(DATASET_CLASSES[dataset])
