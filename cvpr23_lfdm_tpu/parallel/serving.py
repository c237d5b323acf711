"""Multi-chip serving of the full sampling pipeline (dp / tp / sp).

The reference never shards serving: even its multi-GPU trainer samples on
a single device (DM/train_video_flow_diffusion_mhad_multiGPU.py:357 uses
`model.module...` to bypass DataParallel for `sample_one_video`). Here the
whole `sample_video` graph (encoder -> DDIM scan -> frame-batched decode)
is jitted once over a mesh and GSPMD emits the ICI collectives:

  * `dp=N` (`data` axis) — request batch sharded, weights replicated: the
    production throughput mode.
  * `tp=N` (`model` axis) — UNet parameters tensor-sharded under
    UNET_TP_RULES (parallel/mesh.py): HBM relief for denoisers too big
    for one chip; attention runs column/row-parallel with one reduce per
    block.
  * `sp=N` (`space` axis) — reference-image height sharded; XLA
    spatially partitions the LFAE encoder/decoder convs (halo exchanges):
    activation-HBM relief for resolutions far above 128².

Output matches the single-device graph to ulp-level tolerance: threefry
bits are a pure function of key+shape (sharding-independent) and the
forward has no cross-batch collectives, but XLA fuses each partitioning
differently, giving ~1e-5 fp32 reduction-order drift
(`tests/test_serving_mesh.py` pins dp, dp x tp, and dp x sp).

Used by `scripts/demo.py --mesh ...` and `scripts/test_dm.py --mesh ...`
(the product multi-chip serving modes) and by `__graft_entry__.py`'s
serving dryrun leg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cvpr23_lfdm_tpu.parallel.mesh import make_mesh


def parse_mesh_spec(spec: str) -> dict[str, int]:
    """Parse a `--mesh` CLI value like `"dp=8"` or `"dp=4,tp=2"` into an
    ordered {axis: size} dict. Empty string -> {} (single device)."""
    out: dict[str, int] = {}
    if not spec:
        return out
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in ("dp", "tp", "sp"):
            raise ValueError(f"unknown mesh axis {k!r} in --mesh {spec!r}")
        out[k] = int(v)
    return out


# CLI axis -> mesh axis name. `data` shards the request batch, `model`
# tensor-shards the UNet parameters (UNET_TP_RULES), `space` spatially
# partitions the image/feature height (XLA inserts conv halo exchanges).
_AXIS_NAMES = {"dp": "data", "tp": "model", "sp": "space"}


def serving_mesh(spec: str):
    """Build the serving mesh for a `--mesh` spec: any combination of
    `dp=`/`tp=`/`sp=` (e.g. `"dp=4,tp=2"`). The reference never shards
    serving at all; dp is the production mode (batch over requests),
    tp/sp are the HBM-relief modes for models/resolutions too big for one
    chip (weights resp. activations sharded)."""
    axes = parse_mesh_spec(spec)
    if not axes:
        return None
    total = 1
    for v in axes.values():
        total *= v
    if total > len(jax.devices()):
        raise ValueError(
            f"--mesh {spec!r} needs {total} devices but only "
            f"{len(jax.devices())} visible"
        )
    return make_mesh(
        tuple(axes.values()), tuple(_AXIS_NAMES[k] for k in axes)
    )


def sample_video_sharded(
    model,
    mesh,
    unet_vars: dict,
    lfae_vars: dict,
    rng: jax.Array,
    ref_imgs: jnp.ndarray,
    conds: jnp.ndarray,
    cond_scale: float = 1.0,
) -> dict:
    """Data-parallel `FlowDiffusion.sample_video` over `mesh`.

    `ref_imgs [B, H, W, 3]` / `conds [B, cond_dim]` are padded (edge-repeat)
    to a multiple of the mesh's `data` axis, sharded over it, and sampled
    in ONE jitted dispatch; pad rows are stripped from every output.

    Per mesh axis: `data` shards the request batch; `model` tensor-shards
    the UNet parameters under UNET_TP_RULES (Megatron column/row attention
    pairs, conv output channels — LFAE weights stay replicated: the decode
    is gather/conv-bound, not weight-bound); `space` shards the reference
    image height, which GSPMD propagates through the encoder/decoder convs
    as spatial partitioning with halo exchanges. The rng key is replicated;
    threefry bits are a pure function of key+shape, so every sharding
    samples the same video up to fusion-order float drift
    (tests/test_serving_mesh.py pins dp/tp/sp against single-device).
    """
    has = set(mesh.axis_names)
    b = ref_imgs.shape[0]
    n = mesh.shape["data"] if "data" in has else 1
    pad = (-b) % n
    if pad:
        ref_imgs = jnp.concatenate(
            [ref_imgs, jnp.repeat(ref_imgs[-1:], pad, axis=0)], axis=0
        )
        conds = jnp.concatenate(
            [conds, jnp.repeat(conds[-1:], pad, axis=0)], axis=0
        )

    repl = NamedSharding(mesh, P())
    batch_axis = "data" if "data" in has else None
    if "model" in has:
        from cvpr23_lfdm_tpu.parallel.mesh import shard_variables

        unet_vars = shard_variables(jax.device_get(unet_vars), mesh)
    else:
        unet_vars = jax.device_put(unet_vars, repl)
    lfae_vars = jax.device_put(lfae_vars, repl)
    rng = jax.device_put(rng, repl)
    space_axis = "space" if "space" in has else None
    ref_imgs = jax.device_put(
        ref_imgs, NamedSharding(mesh, P(batch_axis, space_axis))
    )
    conds = jax.device_put(conds, NamedSharding(mesh, P(batch_axis)))

    @jax.jit
    def sharded(uv, lv, k, ref, cond):
        return model.sample_video(uv, lv, k, ref, cond, cond_scale)

    out = sharded(unet_vars, lfae_vars, rng, ref_imgs, conds)
    if pad:
        out = {k: v[:b] for k, v in out.items()}
    return out


def demo_asset_path(dataset: str) -> str:
    """Bundled reference image for the argument-free demo (the reference
    ships demo/mug_examples/*.png; ours are synthetic, assets/demo/)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    return os.path.join(repo, "assets", "demo", f"{dataset}_example.png")


def make_demo_assets(out_dir: str, size: int = 128, seed: int = 0) -> list[str]:
    """Write one synthetic example image per dataset (demo default inputs)."""
    import os

    from cvpr23_lfdm_tpu.data.synthetic import _blob_video

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    colors = {"mug": (0.9, 0.6, 0.4), "mhad": (0.4, 0.7, 0.9),
              "natops": (0.5, 0.9, 0.5)}
    for ds, color in colors.items():
        frame = _blob_video(np.random.default_rng(seed), 1, size, color)[0]
        path = os.path.join(out_dir, f"{ds}_example.png")
        from PIL import Image

        Image.fromarray(frame.astype(np.uint8)).save(path)
        paths.append(path)
    return paths
