"""Warping generator (Johnson architecture) — the LFAE decoder.

Reference: LFAE/modules/generator.py:17-166. Encoder 64->128->256,
6-ResBlock bottleneck at 1/4 resolution, decoder with per-scale
flow-warped skip connections and occlusion blending, final sigmoid +
occlusion blend with the warped source image.

Three entry points mirroring the reference API:
* `__call__`     — full forward with the internal flow predictor.
* `compute_fea`  — encoder only -> 256ch 1/4-res reference feature
                   (generator.py:130-134), the DM's conditioning input.
* `forward_with_flow` — decode with an externally supplied flow/occlusion
                   (generator.py:136-166), the DM's decoding interface.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.models.blocks import (
    DownBlock2d,
    ResBlock2d,
    SameBlock2d,
    UpBlock2d,
)
from cvpr23_lfdm_tpu.models.pixelwise_flow import PixelwiseFlowPredictor
from cvpr23_lfdm_tpu.ops.resize import resize_bilinear
from cvpr23_lfdm_tpu.ops.warp import grid_sample, warp_with_occlusion


class Generator(nn.Module):
    num_channels: int = 3
    num_regions: int = 10
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    num_bottleneck_blocks: int = 6
    skips: bool = True
    revert_axis_swap: bool = True
    pixelwise_flow_predictor_params: dict | None = None
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 for serving)
    # "xla" | "tiled": decode warp kernel (see LFAEConfig.warp_impl);
    # eval-mode decodes only — training always uses the XLA warp (the
    # tiled Pallas kernel has no VJP)
    warp_impl: str = "xla"
    # largest resolution the tiled kernel handles (0 = unlimited): scales
    # above the cap always take the XLA gather, and the joint fit flag
    # only aggregates over capped-in scales (LFAEConfig.warp_tiled_max_res)
    tiled_max_res: int = 0

    def setup(self):
        if self.pixelwise_flow_predictor_params is not None:
            self.pixelwise_flow_predictor = PixelwiseFlowPredictor(
                num_regions=self.num_regions,
                num_channels=self.num_channels,
                revert_axis_swap=self.revert_axis_swap,
                axis_name=self.axis_name,
                **self.pixelwise_flow_predictor_params,
            )
        else:
            self.pixelwise_flow_predictor = None

        self.first = SameBlock2d(self.block_expansion, 7, axis_name=self.axis_name, dtype=self.dtype)
        self.down_blocks = [
            DownBlock2d(
                min(self.max_features, self.block_expansion * (2 ** (i + 1))),
                3,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )
            for i in range(self.num_down_blocks)
        ]
        self.up_blocks = [
            UpBlock2d(
                min(
                    self.max_features,
                    self.block_expansion * (2 ** (self.num_down_blocks - i - 1)),
                ),
                3,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"up_blocks_{i}",
            )
            for i in range(self.num_down_blocks)
        ]
        bottleneck_ch = min(
            self.max_features, self.block_expansion * (2**self.num_down_blocks)
        )
        self.bottleneck = [
            ResBlock2d(bottleneck_ch, 3, axis_name=self.axis_name, dtype=self.dtype, name=f"bottleneck_r{i}")
            for i in range(self.num_bottleneck_blocks)
        ]
        # compute-dtype conv, fp32 sigmoid: at 128x128x40f the fp32 final
        # conv was ~3.7 ms/video of the serving decode (params stay fp32)
        self.final = nn.Conv(
            self.num_channels, (7, 7), padding=[(3, 3), (3, 3)],
            dtype=self.dtype, name="final"
        )

    def _encode(self, source_image, train):
        out = self.first(source_image, train)
        skip_feats = [out]
        for blk in self.down_blocks:
            out = blk(out, train)
            skip_feats.append(out)
        return out, skip_feats

    def _decode(self, bottleneck_feat, skip_feats, source_image, flow, occlusion, train):
        """Shared decoder (generator.py:111-126); single-frame wrapper over
        `_decode_core` (encoder batch == flow batch)."""
        prediction, _ = self._decode_core(
            bottleneck_feat, skip_feats, source_image, flow, occlusion, train, 1
        )
        return prediction

    def _decode_core(
        self, bottleneck_feat, skip_feats, source_image, flow, occlusion, train, f
    ):
        """Warping decoder with frame folding and warp fusion.

        Encoder tensors and `source_image` have batch `B`; `flow`/`occlusion`
        have batch `B*f` (f flow fields decode against one shared encoding —
        the DM's 40-frame decode re-encoded the identical reference frame 40
        times in the reference, video_flow_diffusion_model.py:167-175).

        TPU-native warp plan (value-identical to the reference's
        `apply_optical` chain, generator.py:111-126, gathers are the
        latency-bound op on TPU):
        * the initial bottleneck warp IS the first up-skip warp
          (`skip_feats[-1]` is the encoder output) — gathered once;
        * the full-res skip and the source image are concatenated and
          gathered together; the warped source is reused for the final
          blend AND the `deformed` output.

        Returns (prediction `[B*f, H, W, 3]`, deformed `[B*f, H, W, 3]`
        or None when flow is None).
        """
        has_flow = flow is not None
        if not has_flow:
            # plain autoencoder (reference None-motion path, generator.py:86-88)
            out = bottleneck_feat
            for blk in self.bottleneck:
                out = blk(out, train)
            for blk in self.up_blocks:
                out = blk(out, train)
            return nn.sigmoid(self.final(out).astype(jnp.float32)), None

        b = source_image.shape[0]

        def prep(res):
            """flow/occ resized to `res` on the folded frame axis."""
            fl = flow if flow.shape[1:3] == res else resize_bilinear(flow, res)
            oc = None
            if occlusion is not None:
                oc = (
                    occlusion
                    if occlusion.shape[1:3] == res
                    else resize_bilinear(occlusion, res)
                )
            return fl, oc

        # resolve all warp scales upfront: the bottleneck/up-skip scales
        # plus the full-res skip+source warp (skip_feats[-1] IS
        # bottleneck_feat, its warp is reused)
        scale_srcs = [bottleneck_feat]
        if self.skips:
            scale_srcs += [
                skip_feats[-(i + 1)] for i in range(1, len(self.up_blocks))
            ]
            scale_srcs.append(skip_feats[0])
        flows = {}
        for s in scale_srcs:
            res = s.shape[1:3]
            if res not in flows:
                flows[res] = prep(res)

        use_tiled = self.warp_impl == "tiled" and not train
        tiled_res: frozenset = frozenset()
        if use_tiled:
            from cvpr23_lfdm_tpu.ops.warp_pallas import (
                tiled_fit, tiled_supported,
            )

            # scales eligible for the tiled kernel; scales above
            # tiled_max_res statically take the XLA gather (measured
            # per-scale winner, scripts/bench_warp.py --per-scale)
            cap = self.tiled_max_res
            tiled_res = frozenset(
                r for r in flows
                if tiled_supported(*r) and (cap <= 0 or r[0] <= cap)
            )
            use_tiled = bool(tiled_res)
        if use_tiled:
            # ONE fit flag over the tiled scales and ONE conditional around
            # the whole warp-decoder: per-warp lax.cond barriers cost ~6 ms
            # of lost overlap at B=1 (windows <= 32^2 always fit; their
            # geometry returns a constant True that folds away)
            fit = None
            for res in sorted(tiled_res):
                g5 = flows[res][0].reshape(b, f, res[0], res[1], 2)
                sc_fit = tiled_fit(
                    jnp.zeros((b,) + tuple(res) + (1,), jnp.float32), g5
                )
                fit = sc_fit if fit is None else jnp.logical_and(fit, sc_fit)

            return nn.cond(
                fit,
                lambda m: m._decode_warp_stack(
                    bottleneck_feat, skip_feats, source_image, flows,
                    train, f, tiled_res,
                ),
                lambda m: m._decode_warp_stack(
                    bottleneck_feat, skip_feats, source_image, flows,
                    train, f, frozenset(),
                ),
                self,
            )
        return self._decode_warp_stack(
            bottleneck_feat, skip_feats, source_image, flows, train, f,
            frozenset(),
        )

    def _decode_warp_stack(self, bottleneck_feat, skip_feats, source_image,
                           flows, train, f, tiled_res: frozenset):
        """The warp + bottleneck/up-block decoder given per-scale resized
        (flow, occlusion); `tiled_res` statically picks the warp kernel
        per scale (resolutions in the set use the tiled MXU kernel)."""
        b = source_image.shape[0]

        def warp_from(src_b, fl):
            """Gather from per-video source `[B, H, W, C]` with per-frame
            grids `[B*f, H, W, 2]` — no repeat of the source."""
            hh, ww, cc = src_b.shape[1:]
            if (hh, ww) in tiled_res:
                from cvpr23_lfdm_tpu.ops.warp_pallas import warp_video_tiled

                out = warp_video_tiled(src_b, fl.reshape(b, f, hh, ww, 2))
                return out.reshape(b * f, hh, ww, cc)
            grid = fl.reshape(b, f * hh, ww, 2)
            out = grid_sample(src_b, grid)
            return out.reshape(b * f, hh, ww, cc)

        def blend(warped, oc, previous):
            """apply_optical blend (generator.py:69-88)."""
            if oc is None:
                return warped
            if previous is None:
                return warped * oc
            return warped * oc + previous * (1.0 - oc)

        fl32, occ32 = flows[bottleneck_feat.shape[1:3]]
        w32 = warp_from(bottleneck_feat, fl32)
        out = blend(w32, occ32, None)
        for blk in self.bottleneck:
            out = blk(out, train)
        for i, blk in enumerate(self.up_blocks):
            if self.skips:
                skip = skip_feats[-(i + 1)]
                if i == 0:
                    # skip_feats[-1] IS bottleneck_feat: reuse the gather
                    out = blend(w32, occ32, out)
                else:
                    fl_i, occ_i = flows[skip.shape[1:3]]
                    out = blend(warp_from(skip, fl_i), occ_i, out)
            out = blk(out, train)
        deformed = None
        if self.skips:
            skip0 = skip_feats[0]
            fl0, occ0 = flows[skip0.shape[1:3]]
            pack = jnp.concatenate(
                [skip0, source_image.astype(skip0.dtype)], axis=-1
            )
            wpack = warp_from(pack, fl0)
            wskip0 = wpack[..., : skip0.shape[-1]]
            deformed = wpack[..., skip0.shape[-1] :].astype(jnp.float32)
            out = blend(wskip0, occ0, out)
            out = nn.sigmoid(self.final(out).astype(jnp.float32))
            occ0_f = None if occ0 is None else occ0.astype(jnp.float32)
            out = blend(deformed, occ0_f, out)
        else:
            out = nn.sigmoid(self.final(out).astype(jnp.float32))
        return out, deformed

    def __call__(self, source_image, driving_params, source_params,
                 bg_params=None, train: bool = False) -> dict:
        bottleneck_feat, skip_feats = self._encode(source_image, train)
        output = {"bottle_neck_feat": bottleneck_feat}

        flow = occlusion = None
        if self.pixelwise_flow_predictor is not None:
            motion = self.pixelwise_flow_predictor(
                source_image, driving_params, source_params, bg_params, train
            )
            flow = motion["optical_flow"]
            occlusion = motion.get("occlusion_map")
            output["optical_flow"] = flow
            if occlusion is not None:
                output["occlusion_map"] = occlusion

        prediction, deformed = self._decode_core(
            bottleneck_feat, skip_feats, source_image, flow, occlusion, train, 1
        )
        output["prediction"] = prediction
        if flow is not None:
            if deformed is None:  # skips=False: not produced by the decoder
                deformed = warp_with_occlusion(source_image, flow)
            output["deformed"] = deformed
        return output

    def forward_video(self, source_image, driving_params, source_params,
                      bg_params=None, train: bool = False,
                      frames: int = 1) -> dict:
        """Frame-folded full forward: `source_image [B, H, W, 3]` with
        `B*frames` pair entries in the param dicts (every video's frames
        share its reference frame — the pseudo-GT protocol,
        video_flow_diffusion_model.py:116-143). The encoder, the
        anti-aliased source downsample, and the sparse-deform gather each
        run ONCE per video instead of once per (video, frame) pair;
        per-pair outputs are `[B*frames, ...]` like a repeated-source
        `__call__`."""
        bottleneck_feat, skip_feats = self._encode(source_image, train)
        output = {"bottle_neck_feat": bottleneck_feat}

        motion = self.pixelwise_flow_predictor(
            source_image, driving_params, source_params, bg_params, train,
            frames=frames,
        )
        flow = motion["optical_flow"]  # [B*frames, h, w, 2]
        occlusion = motion.get("occlusion_map")
        output["optical_flow"] = flow
        if occlusion is not None:
            output["occlusion_map"] = occlusion

        prediction, deformed = self._decode_core(
            bottleneck_feat, skip_feats, source_image, flow,
            occlusion, train, frames,
        )
        output["prediction"] = prediction
        if deformed is None:  # skips=False: not produced by the decoder
            deformed = warp_with_occlusion(
                jnp.repeat(source_image, frames, axis=0), flow
            )
        output["deformed"] = deformed
        return output

    def forward_flow_video(self, source_image, driving_params, source_params,
                           bg_params=None, train: bool = False,
                           frames: int = 1) -> dict:
        """`forward_video` WITHOUT the warping decoder: encoder bottleneck
        (the DM's `ref_fea`) + dense flow/occlusion prediction only.

        The diffusion training loss consumes exactly {optical_flow,
        occlusion_map, bottle_neck_feat} (video_flow_diffusion_model.py:
        146-157); the reconstruction the reference also computes every
        step (:125-141) feeds only monitoring, so the trainer calls this
        on non-log steps and the full `forward_video` on log steps."""
        bottleneck_feat, _ = self._encode(source_image, train)
        motion = self.pixelwise_flow_predictor(
            source_image, driving_params, source_params, bg_params, train,
            frames=frames,
        )
        return {
            "bottle_neck_feat": bottleneck_feat,
            "optical_flow": motion["optical_flow"],
            "occlusion_map": motion.get("occlusion_map"),
        }

    def compute_fea(self, source_image, train: bool = False) -> jnp.ndarray:
        bottleneck_feat, _ = self._encode(source_image, train)
        return bottleneck_feat

    def forward_with_flow(self, source_image, optical_flow, occlusion_map,
                          train: bool = False) -> dict:
        bottleneck_feat, skip_feats = self._encode(source_image, train)
        prediction, deformed = self._decode_core(
            bottleneck_feat, skip_feats, source_image, optical_flow,
            occlusion_map, train, 1,
        )
        if deformed is None:
            deformed = warp_with_occlusion(source_image, optical_flow)
        return {
            "prediction": prediction,
            "deformed": deformed,
            "bottle_neck_feat": bottleneck_feat,
        }

    def decode_video_with_flow(self, source_image, optical_flow, occlusion_map,
                               train: bool = False) -> dict:
        """Frame-folded `forward_with_flow`: ONE encoder pass per video.

        The reference decodes F frames by re-running the full generator on
        the identical reference frame F times
        (video_flow_diffusion_model.py:167-175, 206-214); here the encoder
        runs once on `[B, H, W, 3]` and only the warps + decoder stack run
        per frame.

        Args:
          source_image: `[B, H, W, 3]`.
          optical_flow: `[B, F, h, w, 2]`; occlusion_map: `[B, F, h, w, 1]`.

        Returns dict with `prediction`/`deformed` `[B, F, H, W, 3]` and
        `bottle_neck_feat` `[B, h, w, C]`.
        """
        b, f = optical_flow.shape[:2]
        bottleneck_feat, skip_feats = self._encode(source_image, train)
        fold = lambda x: x.reshape((b * f,) + x.shape[2:])
        prediction, deformed = self._decode_core(
            bottleneck_feat, skip_feats, source_image, fold(optical_flow),
            None if occlusion_map is None else fold(occlusion_map), train, f,
        )
        unfold = lambda x: x.reshape((b, f) + x.shape[1:])
        if deformed is None:
            deformed = warp_with_occlusion(
                jnp.repeat(source_image, f, axis=0), fold(optical_flow)
            )
        return {
            "prediction": unfold(prediction),
            "deformed": unfold(deformed),
            "bottle_neck_feat": bottleneck_feat,
        }
