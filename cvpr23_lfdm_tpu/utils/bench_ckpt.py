"""Compact trained-regime weights for the serving benchmark.

Random weights make the DM sample NOISE flows, which fail the tiled decode
warp's window fit check by construction, so the headline bench pays the XLA
gather floor that no trained deployment pays (BASELINE.md, round-3 serving
analysis item 3). `scripts/make_bench_ckpt.py` trains the product LFAE and
DM trainers on the synthetic corpus at the full MUG serving config until
sampled flows are in the trained regime (window-fitting), then saves the
two subtrees serving actually reads:

  * the full UNet variables (the sampled flows come from it), and
  * the LFAE **generator** subtree only — `sample_video` is
    `compute_fea` + `decode_video_with_flow` (flow_diffusion.py:255-293);
    the region/bg/pixelwise predictors are training-time-only and stay
    random in the bench.

Weights are stored float16 (storage only; loaded back at the template's
dtype — serving keeps fp32 params per repo convention). A conditioning
vector from the training-time class table rides along so the bench samples
with an in-distribution cond.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

_UNET = "unet.msgpack"
_GEN = "generator.msgpack"
_COND = "cond.npy"
_REF = "ref.npy"
_META = "meta.json"


@dataclasses.dataclass
class BenchCkpt:
    unet_vars: dict
    lfae_vars: dict
    cond: np.ndarray
    # in-distribution reference frame [H, W, 3] in [0, 1] (or None for
    # checkpoints saved before the field existed): serving conditions the
    # UNet on `compute_fea(ref)` — a random-noise ref puts the sampler off
    # the trained manifold even with trained weights
    ref: np.ndarray | None
    # {"objective": "eps"|"x0"|"v", ...}: the sampler must be built with
    # the objective the weights were trained under
    meta: dict


def _to_fp16(tree):
    return jax.tree.map(
        lambda x: np.asarray(jax.device_get(x)).astype(np.float16), tree
    )


import contextlib
import fcntl


@contextlib.contextmanager
def _writer_lock(directory: str):
    """Exclusive advisory lock on `<directory>/.lock`: a second concurrent
    writer raises instead of silently interleaving stale weights into the
    committed artifact (round-4 incident: a reparented stale trainer kept
    overwrite-saving into assets/bench_ckpt after its wrapper was killed —
    CLAUDE.md round-4 lessons)."""
    os.makedirs(directory, exist_ok=True)
    fd = os.open(os.path.join(directory, ".lock"), os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError as e:
            holder = b""
            try:
                holder = os.pread(fd, 64, 0)
            except OSError:
                pass
            raise RuntimeError(
                f"bench-ckpt writer lock held (pid {holder.decode(errors='replace').strip() or '?'}) "
                f"for {directory}; kill the stale writer first"
            ) from e
        os.ftruncate(fd, 0)
        os.pwrite(fd, str(os.getpid()).encode(), 0)
        yield
    finally:
        os.close(fd)


def _atomic_write(path: str, data: bytes) -> None:
    """Write-to-temp + rename-into-place: a crash mid-save can never tear
    a checkpoint file readers are loading."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_bench_ckpt(
    directory: str, unet_vars, lfae_vars, cond, ref=None, meta: dict | None = None
) -> None:
    """Write unet (full) + lfae generator subtree + cond vector (+ optional
    reference frame and meta, e.g. the training objective). Every file is
    written atomically under an exclusive writer lock."""
    import io

    from flax.serialization import msgpack_serialize

    os.makedirs(directory, exist_ok=True)
    # drop the generator's pixelwise_flow_predictor submodule (37.7 of
    # 45.5 M params): serving decodes EXTERNAL flows, so `compute_fea` /
    # `decode_video_with_flow` never apply it (generator.py) — it stays
    # random at load time like the other training-only predictors
    gen_sub = {
        col: {
            "generator": {
                k: v
                for k, v in lfae_vars[col]["generator"].items()
                if k != "pixelwise_flow_predictor"
            }
        }
        for col in ("params", "batch_stats")
    }
    def npy_bytes(arr) -> bytes:
        buf = io.BytesIO()
        np.save(buf, np.asarray(jax.device_get(arr), np.float32))
        return buf.getvalue()

    with _writer_lock(directory):
        _atomic_write(
            os.path.join(directory, _UNET),
            msgpack_serialize(_to_fp16(jax.device_get(unet_vars))),
        )
        _atomic_write(
            os.path.join(directory, _GEN),
            msgpack_serialize(_to_fp16(jax.device_get(gen_sub))),
        )
        _atomic_write(os.path.join(directory, _COND), npy_bytes(cond))
        if ref is not None:
            _atomic_write(os.path.join(directory, _REF), npy_bytes(ref))
        if meta is not None:
            _atomic_write(
                os.path.join(directory, _META),
                json.dumps(meta, indent=1).encode(),
            )


def apply_bench_ckpt(directory: str, cfg, unet_vars, lfae_vars):
    """Load a bench checkpoint AND reconfigure `cfg` to match it: the
    sampler is rebuilt with the objective the weights were trained under,
    and the tiled decode warp gets the checkpoint's measured windows /
    tile shapes / per-scale impl cap (`configure_windows_from_meta`).

    Returns `(cfg, unet_vars, lfae_vars, cond, ref, meta)` with
    device-resident weight trees and `cond` `[1, D]` / `ref` `[1, H, W, 3]`
    (or the passed-through vars and `ref=None` pieces untouched — callers
    should rebuild their model from the returned cfg either way), or
    `None` when the directory is absent/incomplete. Shared by bench.py,
    scripts/bench_batch_sweep.py and scripts/test_dm.py --bench-ckpt."""
    import jax.numpy as jnp

    loaded = load_bench_ckpt(directory, unet_vars, lfae_vars)
    if loaded is None:
        return None
    from cvpr23_lfdm_tpu.ops.warp_pallas import configure_windows_from_meta

    configure_windows_from_meta(loaded.meta)
    lfae_cfg = cfg.lfae
    if loaded.meta.get("tiled_max_res") is not None:
        lfae_cfg = dataclasses.replace(
            lfae_cfg, warp_tiled_max_res=int(loaded.meta["tiled_max_res"])
        )
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion, objective=loaded.meta["objective"]
        ),
        lfae=lfae_cfg,
    )
    cond = jnp.asarray(loaded.cond)[None]
    ref = jnp.asarray(loaded.ref)[None] if loaded.ref is not None else None
    return cfg, loaded.unet_vars, loaded.lfae_vars, cond, ref, loaded.meta


def load_bench_ckpt(directory: str, unet_template, lfae_template):
    """Returns a `BenchCkpt` with the saved weights cast to each template
    leaf's dtype and the generator subtree grafted into `lfae_template`
    (other LFAE submodules keep the template's values), or `None` if the
    directory is absent/incomplete. `ref`/`meta` fall back to None/{"objective":
    "eps"} for checkpoints saved before those files existed."""
    paths = {n: os.path.join(directory, n) for n in (_UNET, _GEN, _COND)}
    if not all(os.path.exists(p) for p in paths.values()):
        return None
    from flax.serialization import msgpack_restore

    def read(name):
        with open(paths[name], "rb") as f:
            return msgpack_restore(f.read())

    def cast_like(saved, template):
        return jax.tree.map(
            lambda s, t: np.asarray(s, dtype=t.dtype).reshape(t.shape),
            saved,
            jax.device_get(template),
        )

    unet_vars = cast_like(read(_UNET), unet_template)
    gen_sub = read(_GEN)
    lfae_vars = jax.device_get(lfae_template)
    lfae_vars = {
        col: dict(lfae_vars[col]) for col in lfae_vars
    }
    for col in ("params", "batch_stats"):
        tgen = dict(lfae_vars[col]["generator"])
        for k, saved in gen_sub[col]["generator"].items():
            tgen[k] = cast_like(saved, tgen[k])
        lfae_vars[col]["generator"] = tgen  # absent keys keep template
    cond = np.load(paths[_COND]).astype(np.float32)
    ref_path = os.path.join(directory, _REF)
    ref = np.load(ref_path).astype(np.float32) if os.path.exists(ref_path) else None
    meta = {"objective": "eps"}
    meta_path = os.path.join(directory, _META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    # Return DEVICE-RESIDENT weight trees: jitted calls silently device_put
    # numpy args on EVERY dispatch, so host-resident weights turn each
    # serving call into a ~300 MB host->device upload — the actual cause of
    # the round-4 headline collapse (BENCH_r04: 10.68 f/s on a healthy
    # tunnel; random-weight rounds were fast because init() returns device
    # arrays). cond/ref stay numpy (tiny; callers wrap them once).
    unet_vars = jax.device_put(unet_vars)
    lfae_vars = jax.device_put(lfae_vars)
    return BenchCkpt(unet_vars, lfae_vars, cond, ref, meta)
