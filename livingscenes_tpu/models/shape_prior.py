"""Shape prior: SIM(3)-equivariant encoder + invariant SDF field.

Functional re-design of the reference inference wrapper
(model_utils.py:83-263). The universal currency is the *codes* pytree

    {"z_so3": (B, C, 3), "z_inv": (B, C), "s": (B,), "t": (B, 1, 3)}

mirroring model_utils.py:190-195. Every downstream task (matching,
registration, reconstruction, joint optimization) consumes codes; all
per-instance Python loops of the reference become `vmap`/batched calls.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.deepsdf import DeepSDFDecoder, DecoderCat
from ..nn.vec_dgcnn_attn import VecDGCNNAttn
from ..nn.vec_layers import VecLinear
from ..ops.fps import farthest_point_sampling
from ..ops.pallas_fps import fps_auto

Array = jax.Array
Codes = Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class ShapePriorConfig:
    """Production hyperparameters (configs/3rscan/dgcnn_attn_inner.yaml)."""

    c_dim: int = 256
    num_layers: int = 7
    feat_dim: tuple = (32, 32, 64, 64, 128, 256, 512)
    down_sample_layers: tuple = (2, 4, 5)
    down_sample_factor: tuple = (2, 4, 4)
    atten_start_layer: int = 2
    atten_multi_head_c: int = 16
    num_knn: int = 16
    scale_factor: float = 64000.0
    center_pred: bool = True
    center_pred_scale: bool = True
    approx_knn: bool = True
    mixed_precision: bool = False
    encoder_type: str = "vecdgcnn_atten"
    decoder_type: str = "inner_deepsdf"
    decoder_dims: tuple = (768,) * 8
    decoder_dropout_prob: float = 0.2
    decoder_latent_in: tuple = (4,)
    sdf2occ_factor: float = -1.0
    n_pcl: int = 1024  # encoder input size (dataset.n_pcl)
    # Optional category-classification head on z_inv
    # (model_utils.py:131-146, sim3sdf_vanilla.py:221-231).
    use_cls: bool = False
    num_cates: int = 7
    # Optional positional-encoding projector: project z_so3 to pe_src
    # equivariant coordinate axes, encode <q, axes> with sin/cos at pe_pow
    # octaves, and append to the invariant query
    # (sim3sdf_vanilla.py:212-219, 407-412 + positional_encoder :387-396).
    use_pe: bool = False
    pe_src: int = 32
    pe_pow: int = 4
    # Optional SVD-orthogonalized O(3) frame head (vec_dgcnn_atten.py:240-244).
    z_so3_as_Omtx: bool = False
    # Fused Pallas attention layers (forward + custom-VJP backward; see
    # nn/pallas_attention.py). TPU only; XLA path elsewhere.
    pallas_attention: bool = False
    # Parity mode: force bit-faithful numerics (exact kNN, native gathers,
    # XLA FPS, unfused K/V) for apples-to-apples comparison against the
    # reference torch model. Production defaults trade ~1e-7-level rounding
    # and kNN recall ~0.99 for throughput; parity runs must not.
    parity: bool = False

    def build_encoder(self):
        """Encoder registry (mirrors model_utils.py:107-112 /
        sim3sdf_vanilla.py:193-200)."""
        if self.encoder_type == "vecdgcnn_atten":
            return VecDGCNNAttn(
                c_dim=self.c_dim,
                num_layers=self.num_layers,
                feat_dim=self.feat_dim,
                down_sample_layers=self.down_sample_layers,
                down_sample_factor=self.down_sample_factor,
                atten_start_layer=self.atten_start_layer,
                atten_multi_head_c=self.atten_multi_head_c,
                num_knn=self.num_knn,
                scale_factor=self.scale_factor,
                center_pred=self.center_pred,
                center_pred_scale=self.center_pred_scale,
                approx_knn=self.approx_knn and not self.parity,
                mixed_precision=self.mixed_precision and not self.parity,
                z_so3_as_Omtx=self.z_so3_as_Omtx,
                fused_kv=not self.parity,
                matmul_gather=not self.parity,
                pallas_fps=not self.parity,
                pallas_attention=self.pallas_attention and not self.parity,
                pallas_knn=not self.parity,
            )
        from ..nn.encoders import DGCNN, PCNet, PointNet, VecDGCNN, VecDGCNNV2

        if self.encoder_type == "vecdgcnn":
            return VecDGCNN(
                c_dim=self.c_dim,
                first_layer_knn=self.num_knn,
                scale_factor=self.scale_factor,
            )
        if self.encoder_type == "vecdgcnn2":
            return VecDGCNNV2(
                c_dim=self.c_dim,
                num_knn=self.num_knn,
                scale_factor=self.scale_factor,
            )
        if self.encoder_type == "dgcnn":
            return DGCNN(c_dim=self.c_dim, num_knn=self.num_knn)
        if self.encoder_type == "pointnet":
            return PointNet(c_dim=self.c_dim)
        if self.encoder_type == "pcnet":
            return PCNet(output_dim=self.c_dim)
        raise ValueError(f"unknown encoder_type {self.encoder_type}")

    def build_decoder(self):
        if self.decoder_type in ("inner_deepsdf", "deepsdf"):
            return DeepSDFDecoder(
                latent_size=self.c_dim,
                dims=self.decoder_dims,
                dropout_prob=self.decoder_dropout_prob,
                latent_in=self.decoder_latent_in,
                pe_dim=self.c_dim + 1 + self.pe_channels,
            )
        if self.decoder_type in ("inner", "inv_mlp"):
            return DecoderCat(
                input_dim=2 * self.c_dim + 1 + self.pe_channels
            )
        raise ValueError(f"unknown decoder_type {self.decoder_type}")

    def build_cls_head(self):
        return ClsHead(c_dim=self.c_dim, num_cates=self.num_cates)

    @property
    def pe_channels(self) -> int:
        """Extra invariant-query channels added by the PE path."""
        return self.pe_src * (1 + 2 * self.pe_pow) if self.use_pe else 0


class ClsHead(nn.Module):
    """Category classifier on the invariant embedding — torch layout
    nn.Sequential(Linear, Sigmoid, Linear, Sigmoid, Linear)
    (model_utils.py:131-146, sim3sdf_vanilla.py:221-231)."""

    c_dim: int = 256
    num_cates: int = 7

    @nn.compact
    def __call__(self, z_inv: Array) -> Array:
        h = jax.nn.sigmoid(nn.Dense(self.c_dim, name="lin0")(z_inv))
        h = jax.nn.sigmoid(nn.Dense(self.c_dim, name="lin1")(h))
        return nn.Dense(self.num_cates, name="lin2")(h)


class ShapePrior:
    """Stateless model bundle: config + (params applied functionally)."""

    def __init__(self, config: ShapePriorConfig | None = None):
        self.config = config or ShapePriorConfig()
        self.encoder = self.config.build_encoder()
        self.decoder = self.config.build_decoder()
        self.cls_head = (
            self.config.build_cls_head() if self.config.use_cls else None
        )
        self.pe_projector = (
            # reference: VecLinear(c_dim, pe_src) with the default se3 mode
            # (sim3sdf_vanilla.py:217-219)
            VecLinear(self.config.c_dim, self.config.pe_src, mode="se3")
            if self.config.use_pe
            else None
        )

    # -- initialization ----------------------------------------------------
    def init_params(self, rng: jax.Array, n_points: Optional[int] = None):
        n = n_points or self.config.n_pcl
        r1, r2 = jax.random.split(rng)
        pc = jax.random.normal(r1, (1, n, 3))
        enc = self.encoder.init(r1, pc)
        dec = self.decoder.init(
            r2,
            jnp.zeros(
                (1, 8, 2 * self.config.c_dim + 1 + self.config.pe_channels)
            ),
        )
        params = {"encoder": enc["params"], "decoder": dec["params"]}
        if self.cls_head is not None:
            cls = self.cls_head.init(r2, jnp.zeros((1, self.config.c_dim)))
            params["cls_head"] = cls["params"]
        if self.pe_projector is not None:
            pe = self.pe_projector.init(
                r2, jnp.zeros((1, self.config.c_dim, 3))
            )
            params["pe_projector"] = pe["params"]
        return params

    # -- encoding ----------------------------------------------------------
    def normalize_input(self, pc: Array):
        """SIM(3) pre-normalization (model_utils.py:165-177).

        pc: (B, N, 3). Returns (pc_normalized, centroid (B,3), scale0 (B,)).
        scale0 = mean of the top-5 pairwise distances.
        """
        centroid = jnp.mean(pc, axis=1)  # (B, 3)
        centered = pc - centroid[:, None, :]
        if (
            self.config.pallas_attention
            and not self.config.parity
            and jax.devices()[0].platform == "tpu"
            and pc.dtype == jnp.float32
        ):
            # VMEM-resident distance matrix + 5 global max-extractions
            # (ops/pallas_scale.py) — skips the (B, N, N) HBM matrix and
            # the top_k pass. Statistic is data (no grad), like the
            # reference's no_grad normalization.
            from ..ops.pallas_scale import top_k_mean_pairwise_distance

            scale0 = top_k_mean_pairwise_distance(
                jax.lax.stop_gradient(centered), 5
            )
            return centered / scale0[:, None, None], centroid, scale0
        d2 = jnp.sum(
            (centered[:, :, None, :] - centered[:, None, :, :]) ** 2, axis=-1
        )
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        B = pc.shape[0]
        top5, _ = jax.lax.top_k(d.reshape(B, -1), 5)
        scale0 = jnp.mean(top5, axis=-1)
        return centered / scale0[:, None, None], centroid, scale0

    def encode(self, params, pc: Array) -> Codes:
        """Encode point clouds (B, N, 3) into codes (model_utils.py:165-197)."""
        from ..nn.vec_dgcnn_attn import VecDGCNNAttn

        N = pc.shape[1]
        fused_front = (
            self.config.pallas_attention
            and not self.config.parity
            and jax.devices()[0].platform == "tpu"
            and pc.dtype == jnp.float32
            and isinstance(self.encoder, VecDGCNNAttn)
            and N % min(256, N) == 0
        )
        if fused_front:
            # One distance pass serves both front-end consumers: the
            # top-5 scale statistic AND the layer-0 kNN graph (neighbor
            # order is invariant to the positive scale division) —
            # ops/pallas_knn.knn_with_topk_scale.
            from ..ops.pallas_knn import knn_with_topk_scale

            centroid = jnp.mean(pc, axis=1)
            centered = pc - centroid[:, None, :]
            idx0, scale0 = knn_with_topk_scale(
                jax.lax.stop_gradient(centered), self.config.num_knn
            )
            normalized = centered / scale0[:, None, None]
            out = self.encoder.apply(
                {"params": params["encoder"]}, normalized,
                first_knn_idx=idx0,
            )
        else:
            normalized, centroid, scale0 = self.normalize_input(pc)
            out = self.encoder.apply(
                {"params": params["encoder"]}, normalized
            )
        if len(out) == 4:
            center_pred, pred_scale, z_so3, z_inv = out
            centroid = center_pred[:, 0, :] + centroid
        else:
            pred_scale, z_so3, z_inv = out
        return {
            "z_so3": z_so3,
            "z_inv": z_inv,
            "s": scale0 * pred_scale,
            "t": centroid[:, None, :],
        }

    def encode_fps(
        self,
        params,
        pc: Array,
        mask: Optional[Array] = None,
        n_fps: int = 1,
        rng: Optional[Array] = None,
    ) -> Codes:
        """FPS-downsample each (padded) instance cloud to n_pcl then encode.

        Batched replacement for the reference's per-instance Python loop
        (model_utils.py:199-215): pc (B, N, 3) with validity mask (B, N).
        With n_fps > 1, FPS restarts from random valid points and the
        resulting codes are averaged (model_utils.py:205-209).
        """
        k = self.config.n_pcl
        B, N, _ = pc.shape
        if n_fps <= 1:
            sampled, _ = fps_auto(pc, k, mask=mask)
            return self.encode(params, sampled)

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if mask is None:
            mask = jnp.ones((B, N), bool)

        def one_restart(key):
            # random valid start point per instance (masked categorical)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            start = jax.random.categorical(key, logits, axis=-1)
            sampled, _ = farthest_point_sampling(
                pc, k, mask=mask, start_idx=start
            )
            return self.encode(params, sampled)

        codes = jax.vmap(one_restart)(jax.random.split(rng, n_fps))
        return jax.tree.map(lambda x: jnp.mean(x, axis=0), codes)

    # -- field decode ------------------------------------------------------
    def invariant_query(
        self, query: Array, codes: Codes, params=None
    ) -> Array:
        """Build the invariant decoder input (model_utils.py:236-240).

        query: (B, M, 3) world-space points. Returns (B, M, 2C+1[+PE]):
        [z_inv | <q, z_so3> | ||q|| | pe] with q = (query - t) / s. The
        optional PE tail (sim3sdf_vanilla.py:387-396,407-412) needs
        `params` for the pe_projector.
        """
        q = (query - codes["t"]) / codes["s"][:, None, None]
        inner = jnp.einsum("bmj,bcj->bmc", q, codes["z_so3"])
        length = jnp.linalg.norm(q, axis=-1, keepdims=True)
        inv_query = jnp.concatenate([inner, length], axis=-1)
        if self.pe_projector is not None:
            axes = self.pe_projector.apply(
                {"params": params["pe_projector"]}, codes["z_so3"]
            )  # (B, pe_src, 3)
            pe_inner = jnp.einsum("bmj,bcj->bmc", q, axes)  # (B, M, pe_src)
            sigma = jnp.pi * (
                2.0 ** jnp.arange(self.config.pe_pow, dtype=q.dtype)
            )
            ang = pe_inner[..., None] * sigma  # (B, M, pe_src, pe_pow)
            pe = jnp.concatenate(
                [pe_inner[..., None], jnp.sin(ang), jnp.cos(ang)], axis=-1
            )
            B, M = pe.shape[:2]
            inv_query = jnp.concatenate(
                [inv_query, pe.reshape(B, M, -1)], axis=-1
            )
        B, M, _ = query.shape
        z = jnp.broadcast_to(
            codes["z_inv"][:, None, :], (B, M, codes["z_inv"].shape[-1])
        )
        return jnp.concatenate([z, inv_query], axis=-1)

    def decode_sdf(
        self,
        params,
        query: Array,
        codes: Codes,
        train: bool = False,
        rngs: Optional[dict] = None,
        matmul_dtype=None,
    ) -> Array:
        """SDF at world-space query points (B, M, 3) -> (B, M).

        `matmul_dtype` (e.g. jnp.bfloat16): run the decoder MLP matmuls in
        that dtype with the invariant query still built in f32 (the
        (query - t)/s geometry keeps full precision; only the MLP input /
        weights are cast, f32 accumulation on the MXU). Output is cast
        back to the query dtype. Used by the decoder_bf16 training knob
        (TrainLossConfig) and throughput-critical inference."""
        x = self.invariant_query(query, codes, params=params)
        kwargs = {"rngs": rngs} if rngs else {}
        dec_params = params["decoder"]
        if matmul_dtype is not None:
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(matmul_dtype)
                if a.dtype == jnp.float32
                else a,
                t,
            )
            out = self.decoder.apply(
                {"params": cast(dec_params)},
                x.astype(matmul_dtype),
                train=train,
                **kwargs,
            )
            return out.astype(x.dtype)
        return self.decoder.apply(
            {"params": dec_params}, x, train=train, **kwargs
        )

    def occupancy_logits(
        self, params, query: Array, codes: Codes, matmul_dtype=None
    ) -> Array:
        """Bernoulli occupancy logits = sdf2occ_factor * sdf
        (model_utils.py:263). `matmul_dtype`: see decode_sdf."""
        return self.config.sdf2occ_factor * self.decode_sdf(
            params, query, codes, matmul_dtype=matmul_dtype
        )

    # -- classification ------------------------------------------------------
    def classify(self, params, codes: Codes) -> Array:
        """Category logits from the invariant embedding
        (model_utils.py:131-146). Returns (B, num_cates)."""
        if self.cls_head is None:
            raise ValueError("model built without use_cls=True")
        return self.cls_head.apply(
            {"params": params["cls_head"]}, codes["z_inv"]
        )


def slice_codes(codes: Codes, index) -> Codes:
    """Select a sub-batch of codes (model_utils.py:309-318)."""
    if isinstance(index, int):
        index = jnp.asarray([index])
    return jax.tree.map(lambda x: x[index], codes)


def concat_codes(code_list) -> Codes:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *code_list)


def transform_codes(codes: Codes, tsfm: Array) -> Codes:
    """Equivariant code transport (lib_more/more_solver.py:230-244).

    tsfm: (B, 3/4, 4) applied to the codes' frame: z_so3 -> z_so3 R^T,
    t -> R t + p. z_inv and s are invariant.
    """
    R = tsfm[..., :3, :3]
    p = tsfm[..., :3, 3]
    return {
        "z_so3": jnp.matmul(codes["z_so3"], jnp.swapaxes(R, -1, -2)),
        "z_inv": codes["z_inv"],
        "s": codes["s"],
        "t": jnp.matmul(codes["t"], jnp.swapaxes(R, -1, -2)) + p[..., None, :],
    }
