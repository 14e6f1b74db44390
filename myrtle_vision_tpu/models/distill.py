"""DeiT knowledge distillation (reference: src/myrtle_vision/models/distill.py).

``DistillWrapper`` holds the learnable distillation token and the distill
MLP head; the frozen teacher runs outside the wrapper (its logits are an
input, computed under stop_gradient — the reference runs the teacher under
torch.no_grad(), distill.py:132-133).  The student is the standard ViT with
``distill_token`` threaded through its forward (models/vit.py), which
repairs the reference's broken student forward by design (SURVEY §2.2: the
reference references self.pool/self.to_latent/self.mlp_head which don't
exist on its ViT; the intent — cls-token pooling + classification head — is
what our ViT's distill path implements).

Loss (reference distill.py:128-151):
  alpha * CE(student_logits, labels)
  + (1 - alpha) * T^2 * KL(log_softmax(distill_logits / T)
                           || softmax(teacher_logits / T))
with KL reduced batchmean-style (sum over classes, mean over batch).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from myrtle_vision_tpu.models.vit import ViT
from myrtle_vision_tpu.training.optim import cross_entropy_loss


def distillation_loss(
    student_logits, distill_logits, teacher_logits, labels, temperature,
    alpha,
):
    """DeiT loss (reference distill.py:128-151):
    alpha * CE(student, labels) + (1-alpha) * T^2 *
    KL(log_softmax(distill/T) || softmax(teacher/T)), KL batchmean."""
    T = temperature
    ce = cross_entropy_loss(student_logits, labels)
    log_q = jax.nn.log_softmax(
        distill_logits.astype(jnp.float32) / T, axis=-1
    )
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T, axis=-1)
    log_p = jax.nn.log_softmax(
        teacher_logits.astype(jnp.float32) / T, axis=-1
    )
    # torch F.kl_div(log_q, p, reduction="batchmean") =
    # mean_b sum_c p * (log p - log q)
    kl = jnp.mean(jnp.sum(p * (log_p - log_q), axis=-1))
    return ce * alpha + kl * (T ** 2) * (1 - alpha)


class DistillWrapper(nn.Module):
    student: ViT
    temperature: float = 1.0
    alpha: float = 0.5

    @nn.compact
    def __call__(
        self,
        img,
        labels,
        teacher_logits,
        deterministic: bool = True,
        calibrating: bool = False,
        temperature=None,
        alpha=None,
    ):
        T = temperature if temperature is not None else self.temperature
        a = alpha if alpha is not None else self.alpha
        dim = self.student.dim
        num_classes = self.student.num_classes

        token = self.param(
            "distillation_token",
            nn.initializers.normal(stddev=1.0),
            (1, 1, dim),
            jnp.float32,
        )
        student_logits, distill_tokens = self.student(
            img,
            deterministic=deterministic,
            calibrating=calibrating,
            distill_token=token,
        )

        x = nn.LayerNorm(epsilon=1e-5, name="distill_mlp_norm")(
            distill_tokens
        )
        distill_logits = nn.Dense(num_classes, name="distill_mlp_linear")(x)

        loss = distillation_loss(
            student_logits, distill_logits, teacher_logits, labels, T, a
        )
        return loss, student_logits


class DistillableViT(ViT):
    """API-parity alias for the reference's DistillableViT
    (reference distill.py:11-27): the standard ViT already accepts a
    ``distill_token`` in its forward and returns (logits, token embedding),
    and the parameter tree is identical to plain ViT — so "converting back"
    to a ViT (the reference's ``to_vit`` state-dict copy) is just using the
    same params with a ViT instance."""

    def to_vit(self) -> ViT:
        kwargs = {
            f.name: getattr(self, f.name)
            for f in self.__dataclass_fields__.values()
            if f.name not in ("parent", "name")
        }
        return ViT(**kwargs)
