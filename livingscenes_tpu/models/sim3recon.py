"""Training model: SIM(3) shape-prior reconstruction losses.

Re-design of the reference production model `sim3sdf_vanilla`
(lib_shape_prior/core/models/sim3sdf_vanilla.py:175-435) as a pure loss
function over the ShapePrior modules. Differences from the inference path
(models/shape_prior.py): the training data is already canonically
normalized by the dataset, so there is no top-5-distance pre-normalization —
the encoder sees the (centroid-subtracted, optionally augmented) cloud and
its scale head is regressed toward 1 (w_s * |s - 1|).

Loss (sim3sdf_vanilla.py:299-353):
  batch_loss = w_uni * L1_near/far(uni) + w_nss * L1_near/far(nss)
             + w_s * |pred_scale - 1| + w_t * ||pred_center||_1
with near/far weighting: errors below loss_th get loss_near_lambda, above
get loss_far_lambda. Validation computes occupancy IoU on eval points
(sim3sdf_vanilla.py:372-380 + _postprocess_after_optim:106-118).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import se3
from .shape_prior import ShapePrior, ShapePriorConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainLossConfig:
    """Defaults mirror configs/3rscan/dgcnn_attn_inner.yaml:9-27."""

    w_uni: float = 0.5
    w_nss: float = 0.5
    w_s: float = 0.001
    w_t: float = 0.2
    w_recon: float = 1.0
    loss_th: float = 0.1
    loss_near_lambda: float = 1.0
    loss_far_lambda: float = 0.5
    center_aug_std: float = 0.05
    rot_aug: bool = False
    iou_threshold: float = 0.5
    w_cls: float = 1.0
    # bfloat16 decoder matmuls in the train loss (geometry / losses /
    # grads stay f32; MXU accumulates f32). Off by default — parity with
    # the reference's f32 training. A/B: docs/ROUND4_NOTES.md.
    decoder_bf16: bool = False


class SIM3Recon:
    """Stateless training-model bundle around a ShapePrior."""

    def __init__(
        self,
        config: ShapePriorConfig | None = None,
        loss_config: TrainLossConfig = TrainLossConfig(),
    ):
        self.prior = ShapePrior(config)
        self.loss_cfg = loss_config

    @property
    def config(self):
        return self.prior.config

    def init_params(self, rng):
        return self.prior.init_params(rng)

    def _encode_training(
        self, params, input_pcl: Array, rng: Optional[Array], train: bool
    ):
        """Centroid split + optional center-noise aug + raw encoder call
        (sim3sdf_vanilla.py:277-308; no scale0 normalization in training)."""
        cfg = self.loss_cfg
        centroid = jnp.mean(input_pcl, axis=1)  # (B, 3)
        if train and cfg.center_aug_std > 0 and rng is not None:
            noise = cfg.center_aug_std * jax.random.normal(
                rng, centroid.shape, centroid.dtype
            )
            centroid = centroid + noise
        centered = input_pcl - centroid[:, None, :]
        out = self.prior.encoder.apply(
            {"params": params["encoder"]}, centered
        )
        if len(out) == 4:
            center_pred, pred_scale, z_so3, z_inv = out
            centroid = center_pred[:, 0, :] + centroid
        else:
            pred_scale, z_so3, z_inv = out
        codes = {
            "z_so3": z_so3,
            "z_inv": z_inv,
            "s": pred_scale,
            "t": centroid[:, None, :],
        }
        return codes, pred_scale, centroid

    def loss(
        self,
        params,
        batch: Dict[str, Array],
        rng: Optional[Array] = None,
        train: bool = True,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Compute batch loss + metrics.

        batch keys (all arrays, point-last-3 layout):
          inputs (B, N, 3); points_uni (B, Qu, 3); points_uni_value (B, Qu);
          points_nss (B, Qn, 3); points_nss_value (B, Qn);
          optional eval_points (B, E, 3), eval_points_occ (B, E).
        """
        cfg = self.loss_cfg
        rngs = (
            dict(zip(("aug", "dropout", "rot"), jax.random.split(rng, 3)))
            if rng is not None
            else {}
        )
        inputs = batch["inputs"]
        query = jnp.concatenate(
            [batch["points_uni"], batch["points_nss"]], axis=1
        )
        if cfg.rot_aug and rngs:
            # Random SO(3) aug applied in train AND val phases
            # (sim3sdf_vanilla.py:269-275). The reference skips rotating the
            # query for decoder types that consume canonical-space raw
            # queries; in this repo decode_sdf always routes through the
            # invariant query (<q, z_so3>, ||q||), which is equivariant for
            # EVERY decoder_type — so the query must always rotate with the
            # input or SDF supervision is silently misaligned.
            R = se3.random_rotation(rngs["rot"], (inputs.shape[0],))
            R = R.astype(inputs.dtype)
            inputs = jnp.einsum("bij,bnj->bni", R, inputs)
            query = jnp.einsum("bij,bnj->bni", R, query)
        codes, pred_scale, centroid = self._encode_training(
            params, inputs, rngs.get("aug"), train
        )

        loss_scale = jnp.mean(jnp.abs(pred_scale - 1.0))
        loss_center = jnp.mean(jnp.sum(jnp.abs(centroid), axis=-1))
        error_center = jnp.linalg.norm(centroid, axis=-1)
        sdf_gt = jnp.concatenate(
            [batch["points_uni_value"], batch["points_nss_value"]], axis=1
        )
        dropout_rng = rngs.get("dropout")
        sdf_hat = self.prior.decode_sdf(
            params,
            query,
            codes,
            train=train,
            rngs={"dropout": dropout_rng} if (train and dropout_rng is not None) else None,
            matmul_dtype=jnp.bfloat16 if cfg.decoder_bf16 else None,
        )

        err = jnp.abs(sdf_hat - sdf_gt)
        near = jax.lax.stop_gradient((err < cfg.loss_th).astype(err.dtype))
        loss_i = err * (
            near * cfg.loss_near_lambda + (1.0 - near) * cfg.loss_far_lambda
        )
        n_uni = batch["points_uni"].shape[1]
        n_nss = batch["points_nss"].shape[1]
        uni_loss = jnp.mean(loss_i[:, :n_uni])
        # occ-mode datasets carry no near-surface set (width-0 arrays,
        # shapenet_new2.py occ branch); static shape, so skip in Python.
        nss_loss = (
            jnp.mean(loss_i[:, n_uni:]) if n_nss > 0 else jnp.zeros(())
        )

        batch_loss = (
            cfg.w_uni * uni_loss
            + cfg.w_nss * nss_loss
            + cfg.w_s * loss_scale
            + cfg.w_t * loss_center
        )
        cls_metrics = {}
        if self.prior.cls_head is not None and "class" in batch:
            logits = self.prior.classify(params, codes)
            # The reference feeds softmax(logits) INTO CrossEntropyLoss
            # (which itself log-softmaxes) — reproduce that double-softmax
            # faithfully (sim3sdf_vanilla.py:340-347).
            probs = jax.nn.softmax(logits, axis=-1)
            logp = jax.nn.log_softmax(probs, axis=-1)
            gt = batch["class"].astype(jnp.int32)
            loss_cls = -jnp.mean(
                jnp.take_along_axis(logp, gt[:, None], axis=-1)
            )
            acc = jnp.mean((jnp.argmax(probs, axis=-1) == gt).astype(
                jnp.float32
            ))
            batch_loss = batch_loss + cfg.w_cls * loss_cls
            cls_metrics = {"loss_cls": loss_cls, "metric_bs_cls_acc": acc}
        metrics = {
            "batch_loss": batch_loss,
            "loss_recon_uni": uni_loss,
            "loss_recon_nss": nss_loss,
            "loss_s": loss_scale,
            "loss_t": loss_center,
            "metric_t": jnp.mean(error_center),
            "metric_recon_uni_error": jnp.mean(err[:, :n_uni]),
            "metric_recon_nss_error": (
                jnp.mean(err[:, n_uni:]) if n_nss > 0 else jnp.zeros(())
            ),
            "scale_mean": jnp.mean(pred_scale),
            **cls_metrics,
        }
        return batch_loss, metrics

    def val_iou(self, params, batch: Dict[str, Array]) -> Array:
        """Occupancy IoU on eval points (the model-selection metric,
        sim3sdf_vanilla.py:106-118 + oflow_common.eval_iou)."""
        codes, _, _ = self._encode_training(
            params, batch["inputs"], None, train=False
        )
        logits = self.prior.occupancy_logits(
            params, batch["eval_points"], codes
        )
        occ_pred = jax.nn.sigmoid(logits) >= self.loss_cfg.iou_threshold
        occ_gt = batch["eval_points_occ"] > 0.5
        inter = jnp.sum(occ_pred & occ_gt, axis=-1)
        union = jnp.sum(occ_pred | occ_gt, axis=-1)
        return inter / jnp.maximum(union, 1)
