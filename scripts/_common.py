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
    p.add_argument(
        "--bert-path", default="bert-base-cased",
        help="HF name or LOCAL dir with the bert-base-cased checkpoint "
        "(config.json + weights + vocab.txt) for class-text embeddings",
    )
    p.add_argument(
        "--allow-random-text", action="store_true",
        help="permit a deterministic RANDOM class-embedding table when BERT "
        "weights are unreachable (smoke/ablation only; conditioning values "
        "will NOT match the reference). Implied by --synthetic.",
    )
    p.add_argument(
        "--matmul-precision", default="default",
        choices=["default", "tensorfloat32", "highest"],
        help="TPU matmul precision for f32 inputs. 'default' multiplies in "
        "1-pass bf16 (fast); 'highest' = 3-pass fp32 emulation — required "
        "for strict frame-for-frame parity with the fp32 torch reference",
    )
    p.add_argument(
        "--loader", default="threads", choices=["threads", "grain"],
        help="batch loader backend: GIL-releasing thread pool (default) or "
        "Grain worker PROCESSES (true parallelism, shared-memory transfer)",
    )
    p.add_argument(
        "--attn-impl", default="auto", choices=["auto", "xla", "pallas3", "pallas2", "pallas"],
        help="temporal-attention implementation; auto = head-packed Pallas "
        "kernel on TPU (fwd+bwd, ~4x the XLA form), XLA einsums elsewhere",
    )
    p.add_argument(
        "--warp-impl", default="auto", choices=["auto", "xla", "tiled"],
        help="serving decode warp: tiled one-hot MXU kernel with fit-checked "
        "XLA fallback (auto = tiled on TPU); training always uses XLA",
    )
    p.add_argument(
        "--lfae-dtype", default="", choices=["", "float32", "bfloat16"],
        help="LFAE compute dtype override (default: preset float32 = "
        "reference numerics). bfloat16 is the bench.py serving "
        "configuration — ~2x faster decode / frozen pseudo-GT convs at "
        "~1e-2 output drift (params stay fp32 either way)",
    )
    p.add_argument(
        "--coordinator", default="",
        help="multi-host: coordinator address host:port (DCN training; "
        "every process runs this same script). On TPU pods with cluster "
        "metadata, pass --num-processes alone and jax auto-detects.",
    )
    p.add_argument("--num-processes", type=int, default=0,
                   help="multi-host: total process count (0 = single)")
    p.add_argument(
        "--mesh", default="",
        help="multi-chip serving mesh, e.g. 'dp=8' or 'dp=4,tp=2' or "
        "'dp=4,sp=2': request batch sharded over dp, UNet weights "
        "tensor-sharded over tp (UNET_TP_RULES), image height spatially "
        "partitioned over sp — one jitted dispatch, ulp-identical to "
        "single-device (parallel/serving.py). Empty = single device.",
    )
    p.add_argument("--process-id", type=int, default=-1,
                   help="multi-host: this process's id (with --coordinator)")
    return p


def resolve_attn_impl(args, training: bool = False) -> str:
    """'auto' -> the fastest Pallas kernel on TPU backends, XLA elsewhere
    (Mosaic kernels only lower for TPU; gpu/cpu get the einsum form).

    Serving gets the fused whole-layer kernel (`pallas3`, forward-only);
    training needs the differentiable head-packed kernel (`pallas2`,
    custom-VJP backward)."""
    if args.attn_impl != "auto":
        return args.attn_impl
    import jax

    if jax.default_backend() != "tpu":
        return "xla"
    return "pallas2" if training else "pallas3"


def resolve_warp_impl(args) -> str:
    """'auto' -> the tiled one-hot MXU decode warp on TPU (its fit-checked
    lax.cond falls back to the XLA gather for non-window-fitting flows),
    plain XLA elsewhere. Eval-mode decodes only; the Generator ignores the
    knob under train=True."""
    if getattr(args, "warp_impl", "auto") != "auto":
        return args.warp_impl
    import jax

    return "tiled" if jax.default_backend() == "tpu" else "xla"


def apply_lfae_dtype(cfg, args):
    """Apply the `--lfae-dtype` override to a full Config (no-op when the
    flag is empty = keep the preset's float32 reference numerics)."""
    if getattr(args, "lfae_dtype", ""):
        import dataclasses

        cfg = cfg.replace(
            lfae=dataclasses.replace(cfg.lfae, compute_dtype=args.lfae_dtype)
        )
    return cfg


def setup_platform(args) -> None:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "matmul_precision", "default") != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    if getattr(args, "num_processes", 0) > 1 or getattr(args, "coordinator", ""):
        from cvpr23_lfdm_tpu.parallel.distributed import init_distributed

        info = init_distributed(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None,
        )
        print(
            f"multi-host: process {info['process_index']}/"
            f"{info['process_count']}, {info['device_count']} devices"
        )


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


def load_text_embedder(dataset_or_args, allow_random: bool = False):
    """Cached BERT class-text table. When no cache exists and weights are
    unreachable, this is a HARD error unless --allow-random-text (or
    --synthetic smoke mode): silently training/serving on a random table
    produces conditioning values that cannot match the reference. Direct
    string-dataset callers get the same hard-error default; tests opt in
    with `allow_random=True` explicitly."""
    from cvpr23_lfdm_tpu.models.text import DATASET_CLASSES, TextEmbedder

    if isinstance(dataset_or_args, str):  # tests / direct calls
        dataset, bert_path = dataset_or_args, "bert-base-cased"
    else:
        args = dataset_or_args
        dataset = args.dataset
        bert_path = args.bert_path
        allow_random = args.allow_random_text or args.synthetic
    env_set = False
    if allow_random and "HF_HUB_OFFLINE" not in os.environ:
        # smoke mode tolerates the random table, so don't let transformers
        # retry the hub for ~2 min in egress-less environments — offline
        # mode fails fast (local dirs and cached snapshots still load)
        os.environ["HF_HUB_OFFLINE"] = "1"
        env_set = True
    try:
        return TextEmbedder.build(dataset, model_name_or_path=bert_path)
    except Exception as e:  # no cache and no reachable BERT
        if not allow_random:
            raise SystemExit(
                f"BERT class embeddings unavailable ({e}).\n"
                f"Provide --bert-path <dir> with a local bert-base-cased "
                f"checkpoint (config.json + pytorch_model.bin/safetensors + "
                f"vocab.txt), or pass --allow-random-text to proceed with a "
                f"deterministic random table (smoke/ablation only)."
            )
        print(f"warning: BERT embeddings unavailable ({e}); using random table")
        return TextEmbedder.random_for_testing(DATASET_CLASSES[dataset])
    finally:
        if env_set:
            del os.environ["HF_HUB_OFFLINE"]
