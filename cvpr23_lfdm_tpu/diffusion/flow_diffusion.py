"""FlowDiffusion: frozen LFAE + conditional 3D-UNet diffusion, end to end.

Reference: DM/modules/video_flow_diffusion_model.py:17-253. TPU-native
redesign of the two reference hot loops:

* The per-frame pseudo-ground-truth LFAE loop (reference :126-137 — 40
  sequential full LFAE passes per step, each with a CPU SVD sync) is ONE
  batched call with frames folded into the batch axis `[B*F, ...]`.
* The per-frame decode loops (:167-175, :206-214) likewise fold into one
  `forward_with_flow` call.

Everything here is a pure function over explicit variable pytrees:
`lfae_vars` (frozen stage-1 weights) and `unet_vars` (trainable). Latent
volumes are channel-last `[B, F, h, w, 3]` = (flow_x, flow_y, conf*2-1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cvpr23_lfdm_tpu.config import DiffusionConfig, LFAEConfig
from cvpr23_lfdm_tpu.diffusion.gaussian_diffusion import GaussianDiffusion
from cvpr23_lfdm_tpu.models.flow_autoenc import build_lfae_modules
from cvpr23_lfdm_tpu.models.generator import Generator
from cvpr23_lfdm_tpu.models.unet3d import Unet3D
from cvpr23_lfdm_tpu.ops.grid import identity_flow_volume


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    """[B, F, ...] -> [B*F, ...]"""
    return x.reshape((-1,) + x.shape[2:])


def _unfold(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """[B*F, ...] -> [B, F, ...]"""
    return x.reshape((b, -1) + x.shape[1:])


def _repeat_frames(tree, f: int):
    """Repeat each leaf's batch entries F times: [B, ...] -> [B*F, ...]."""
    return jax.tree.map(lambda a: jnp.repeat(a, f, axis=0), tree)


@dataclasses.dataclass(frozen=True)
class FlowDiffusion:
    """Stateless orchestrator; all methods are pure and jit-compatible."""

    lfae_cfg: LFAEConfig
    cfg: DiffusionConfig

    def __post_init__(self):
        region, bg, generator = build_lfae_modules(self.lfae_cfg)
        object.__setattr__(self, "region_predictor", region)
        object.__setattr__(self, "bg_predictor", bg)
        object.__setattr__(self, "generator", generator)
        object.__setattr__(
            self,
            "unet",
            Unet3D(
                dim=self.cfg.dim,
                cond_dim=self.cfg.cond_dim,
                dim_mults=tuple(self.cfg.dim_mults),
                attn_heads=self.cfg.attn_heads,
                attn_dim_head=self.cfg.attn_dim_head,
                learn_null_cond=self.cfg.learn_null_cond,
                use_deconv=self.cfg.use_deconv,
                use_final_activation=self.cfg.use_final_activation,
                dtype=jnp.dtype(self.cfg.compute_dtype),
                temporal_attn_impl=self.cfg.temporal_attn_impl,
            ),
        )
        object.__setattr__(self, "diffusion", GaussianDiffusion.create(self.cfg))

    # ------------------------------------------------------------ submodule glue

    def _lfae_sub(self, lfae_vars: dict, name: str) -> dict:
        return {
            "params": lfae_vars["params"][name],
            "batch_stats": lfae_vars["batch_stats"][name],
        }

    def denoise_fn(self, unet_vars: dict):
        """Bind UNet variables into a pure eps-predictor.
        `fea` rides separately (`[B, 1, h, w, Cf]`) so the init conv's
        feature half stays loop- and frame-invariant."""

        def denoise(x, t, cond, null_cond_mask, fea):
            return self.unet.apply(
                unet_vars, x, t, cond, null_cond_mask, fea=fea
            )

        return denoise

    # ------------------------------------------------------------ pseudo GT

    def pseudo_ground_truth(
        self, lfae_vars: dict, ref_img: jnp.ndarray, real_vid: jnp.ndarray,
        with_decode: bool = True,
    ) -> dict:
        """Frozen-LFAE latent flow volume for a real video
        (video_flow_diffusion_model.py:116-143), frame-batched.

        Args:
          ref_img: `[B, H, W, 3]` (frame 0 of each video in training).
          real_vid: `[B, F, H, W, 3]`.
          with_decode: also decode the LFAE reconstruction
            (`out_vid`/`warped_vid`). The diffusion loss only needs
            flow/conf/ref_fea; the reconstruction feeds monitoring
            (reference pays it every step, :125-141 — here non-log train
            steps skip it, ~1/3 of the r2 step time).

        Returns dict with `vid_grid [B,F,h,w,2]`, `vid_conf [B,F,h,w,1]`,
        `ref_fea [B,h,w,C]`, and (with_decode) `out_vid`/`warped_vid`
        `[B,F,H,W,3]`.
        """
        b, f = real_vid.shape[:2]
        region_vars = self._lfae_sub(lfae_vars, "region_predictor")
        bg_vars = self._lfae_sub(lfae_vars, "bg_predictor")
        gen_vars = self._lfae_sub(lfae_vars, "generator")

        source_params = self.region_predictor.apply(region_vars, ref_img)
        frames = _fold(real_vid)  # [B*F, H, W, 3]
        driving_params = self.region_predictor.apply(region_vars, frames)

        ref_rep = jnp.repeat(ref_img, f, axis=0)
        bg_params = self.bg_predictor.apply(bg_vars, ref_rep, frames)

        # frame-folded generator forward: encoder + source downsample +
        # sparse-deform gather run once per video, not once per frame
        generated = self.generator.apply(
            gen_vars,
            ref_img,
            driving_params,
            _repeat_frames(source_params, f),
            bg_params,
            frames=f,
            method=(
                Generator.forward_video if with_decode
                else Generator.forward_flow_video
            ),
        )
        out = {
            "vid_grid": _unfold(generated["optical_flow"], b),
            "vid_conf": _unfold(generated["occlusion_map"], b),
            # encoder ran once per video already
            "ref_fea": generated["bottle_neck_feat"],
        }
        if with_decode:
            out["out_vid"] = _unfold(generated["prediction"], b)
            out["warped_vid"] = _unfold(generated["deformed"], b)
        return jax.lax.stop_gradient(out)

    # ------------------------------------------------------------ latent codec

    def encode_latent(self, vid_grid: jnp.ndarray, vid_conf: jnp.ndarray) -> jnp.ndarray:
        """(flow, conf) -> diffusion space `[B,F,h,w,3]`
        (video_flow_diffusion_model.py:146-157): conf mapped to [-1,1],
        optionally flow made residual to the identity grid."""
        if self.cfg.use_residual_flow:
            b, f, h, w = vid_grid.shape[:4]
            vid_grid = vid_grid - identity_flow_volume(b, f, h, w, vid_grid.dtype)
        return jnp.concatenate([vid_grid, vid_conf * 2.0 - 1.0], axis=-1)

    def decode_latent(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """diffusion space -> (flow `[B,F,h,w,2]`, conf `[B,F,h,w,1]`)
        (video_flow_diffusion_model.py:163-166, 196-201)."""
        vid_grid = x[..., :2]
        if self.cfg.use_residual_flow:
            b, f, h, w = vid_grid.shape[:4]
            vid_grid = vid_grid + identity_flow_volume(b, f, h, w, vid_grid.dtype)
        vid_conf = (x[..., 2:3] + 1.0) * 0.5
        return vid_grid, vid_conf

    # ------------------------------------------------------------ decode to video

    def decode_flow_video(
        self, lfae_vars: dict, ref_img: jnp.ndarray,
        vid_grid: jnp.ndarray, vid_conf: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-frame `forward_with_flow` (video_flow_diffusion_model.py:167-175)
        — frame-folded, with ONE encoder pass on the shared reference frame
        (Generator.decode_video_with_flow). Returns (out_vid, warped_vid)."""
        gen_vars = self._lfae_sub(lfae_vars, "generator")
        generated = self.generator.apply(
            gen_vars,
            ref_img,
            vid_grid,
            vid_conf,
            method=Generator.decode_video_with_flow,
        )
        return generated["prediction"], generated["deformed"]

    # ------------------------------------------------------------ training

    def loss(
        self,
        unet_vars: dict,
        lfae_vars: dict,
        rng: jax.Array,
        ref_img: jnp.ndarray,
        real_vid: jnp.ndarray,
        cond: jnp.ndarray,
        none_cond_mask: jnp.ndarray | None = None,
        with_monitoring: bool = True,
        only_use_flow: bool = True,
    ) -> tuple[jnp.ndarray, dict]:
        """Full training forward (video_flow_diffusion_model.py:116-179).

        Returns (total training loss, aux dict incl. reconstructions).
        NOTE reference quirk: the decode runs under `torch.no_grad()`
        (:158) even when `only_use_flow` is False, so the rec losses added
        by optimize_parameters (:184-188) are grad-free constants — the
        gradient is the diffusion loss's either way. Reproduced exactly:
        `pred_x0` is always stop-gradient'd; `only_use_flow=False` only
        changes the reported total.
        """
        gt = self.pseudo_ground_truth(
            lfae_vars, ref_img, real_vid,
            # the LFAE reconstruction (real-out/real-warp) feeds only the
            # periodic viz dumps; the rec monitoring losses below compare
            # against real_vid directly, so non-log steps skip the decode
            with_decode=with_monitoring,
        )
        x_start = self.encode_latent(gt["vid_grid"], gt["vid_conf"])
        loss, dm_aux = self.diffusion.p_losses(
            self.denoise_fn(unet_vars), rng, x_start, gt["ref_fea"], cond, none_cond_mask
        )
        aux = {"loss": loss, **gt}
        total = loss
        if with_monitoring or not only_use_flow:
            pred_x0 = jax.lax.stop_gradient(dm_aux["pred_x0"])
            fake_grid, fake_conf = self.decode_latent(pred_x0)
            fake_out, fake_warped = self.decode_flow_video(
                lfae_vars, ref_img, fake_grid, fake_conf
            )
            rec_loss = jnp.mean(jnp.abs(real_vid - fake_out))
            rec_warp_loss = jnp.mean(jnp.abs(real_vid - fake_warped))
            aux.update(
                fake_out_vid=fake_out,
                fake_warped_vid=fake_warped,
                fake_vid_grid=fake_grid,
                fake_vid_conf=fake_conf,
                rec_loss=rec_loss,
                rec_warp_loss=rec_warp_loss,
            )
            if not only_use_flow:
                total = loss + rec_loss + rec_warp_loss
        return total, aux

    # ------------------------------------------------------------ sampling

    def sample_video(
        self,
        unet_vars: dict,
        lfae_vars: dict,
        rng: jax.Array,
        sample_img: jnp.ndarray,
        cond: jnp.ndarray,
        cond_scale: float = 1.0,
        init_img: jnp.ndarray | None = None,
        noise_seq: jnp.ndarray | None = None,
    ) -> dict:
        """`sample_one_video` (video_flow_diffusion_model.py:190-216):
        encoder feature -> DDPM/DDIM scan -> frame-batched decode.
        `init_img`/`noise_seq` inject the gaussians (parity tests)."""
        gen_vars = self._lfae_sub(lfae_vars, "generator")
        fea = self.generator.apply(
            gen_vars, sample_img, method=Generator.compute_fea
        )
        pred = self.diffusion.sample(
            self.denoise_fn(unet_vars),
            rng,
            fea,
            cond=cond,
            cond_scale=cond_scale,
            num_frames=self.cfg.num_frames,
            image_size=self.cfg.img_size,
            init_img=init_img,
            noise_seq=noise_seq,
        )
        vid_grid, vid_conf = self.decode_latent(pred)
        out_vid, warped_vid = self.decode_flow_video(
            lfae_vars, sample_img, vid_grid, vid_conf
        )
        return {
            "vid_grid": vid_grid,
            "vid_conf": vid_conf,
            "out_vid": out_vid,
            "warped_vid": warped_vid,
        }

    def decode_fit_flags(self, vid_grid: jnp.ndarray) -> dict:
        """Per-decode-scale tiled-warp fit flags for sampled flows
        `[B, F, h, w, 2]`: which branch the generator's joint fit
        `nn.cond` (generator.py:_decode_core) would take at each scale.
        Observability only (bench/serving reports which warp path a run
        actually measured); jit-compatible, returns {"<res>": bool_}."""
        from cvpr23_lfdm_tpu.ops.resize import resize_bilinear
        from cvpr23_lfdm_tpu.ops.warp_pallas import tiled_fit, tiled_supported

        b, f, gh, gw, _ = vid_grid.shape
        s = self.lfae_cfg.frame_shape
        d = self.lfae_cfg.generator.num_down_blocks
        flags = {}
        for i in range(d + 1):
            res = s // (2 ** (d - i))
            if not tiled_supported(res, res):
                continue
            g = vid_grid
            if (gh, gw) != (res, res):
                g = resize_bilinear(
                    vid_grid.reshape(b * f, gh, gw, 2), (res, res)
                ).reshape(b, f, res, res, 2)
            flags[str(res)] = tiled_fit(
                jnp.zeros((b, res, res, 1), jnp.float32), g
            )
        return flags

    # ------------------------------------------------------------ init

    def init_unet_vars(self, rng: jax.Array, batch: int = 1) -> dict:
        s = self.cfg.img_size
        x = jnp.zeros(
            (batch, self.cfg.num_frames, s, s, 3), jnp.float32
        )
        fea = jnp.zeros((batch, 1, s, s, self._fea_channels()), jnp.float32)
        t = jnp.zeros((batch,), jnp.int32)
        cond = jnp.zeros((batch, self.cfg.cond_dim), jnp.float32)
        # jit: eager init dispatches per-op, which is slow on tunneled devices
        return jax.jit(lambda r: self.unet.init(r, x, t, cond, fea=fea))(rng)

    def _fea_channels(self) -> int:
        g = self.lfae_cfg.generator
        return min(g.max_features, g.block_expansion * (2**g.num_down_blocks))
