"""Supervised probes: speaker / phone / CTC-phone criteria.

Reference: /root/reference/cpc/criterion/criterion.py:260-355.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..models.transformer import Dense
from .infonce import BaseCriterion
from .seq_alignment import collapse_label_chain_padded


class SpeakerCriterion(BaseCriterion):
    """Linear speaker classifier on the LAST context frame
    (criterion.py:260-281)."""

    dim_encoder: int
    n_speakers: int

    @nn.compact
    def __call__(self, c_feature, encoded_data, label, train: bool = False):
        c = c_feature[:, -1, :]
        logits = Dense(self.n_speakers,
                       name="linearSpeakerClassifier")(c).astype(jnp.float32)
        lsm = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(lsm, label[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(logits, axis=1) == label)
                       .astype(jnp.float32))
        return loss.reshape(1), acc.reshape(1)


class PhoneCriterion(BaseCriterion):
    """Frame-wise phone classifier (criterion.py:284-319)."""

    dim_encoder: int
    n_phones: int
    on_encoder: bool = False
    n_layers: int = 1

    def setup(self):
        self.classifiers = [Dense(self.n_phones, name=f"classifier{l}")
                            for l in range(self.n_layers)]

    def get_prediction(self, c_feature):
        y = self.classifiers[0](c_feature)
        for layer in self.classifiers[1:]:
            y = layer(nn.relu(y))
        return y

    def __call__(self, c_feature, encoded_data, label, train: bool = False):
        x = encoded_data if self.on_encoder else c_feature
        logits = self.get_prediction(x).astype(jnp.float32)
        logits = logits.reshape(-1, self.n_phones)
        label = label.reshape(-1)
        lsm = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(lsm, label[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(logits, axis=1) == label)
                       .astype(jnp.float32))
        return loss.reshape(1), acc.reshape(1)


class CTCPhoneCriterion(BaseCriterion):
    """Linear head + CTC loss, blank = n_phones (criterion.py:322-355).

    Labels arrive frame-aligned; repeats are collapsed on device
    (seq_alignment.py:64-86 semantics) before optax's CTC.
    """

    dim_encoder: int
    n_phones: int
    on_encoder: bool = False

    def setup(self):
        if self.on_encoder:
            raise ValueError("On encoder version not implemented yet")
        self.classifier = Dense(self.n_phones + 1,
                                name="PhoneCriterionClassifier")

    def get_prediction(self, c_feature):
        return self.classifier(c_feature)

    def __call__(self, c_feature, encoded_data, label, train: bool = False):
        B, S, _ = c_feature.shape
        logits = self.classifier(c_feature).astype(jnp.float32)  # (B,S,P+1)
        targets, target_pad = collapse_label_chain_padded(label)
        logit_pad = jnp.zeros((B, S), jnp.float32)
        loss = optax.ctc_loss(logits, logit_pad, targets, target_pad,
                              blank_id=self.n_phones)
        # torch nn.CTCLoss(reduction='mean') divides each sequence's loss by
        # its target length before averaging (criterion.py:328).
        sizes = jnp.sum(1.0 - target_pad, axis=1)
        loss = loss / jnp.maximum(sizes, 1.0)
        # zero_infinity=True parity (criterion.py:328)
        loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
        return jnp.mean(loss).reshape(1), jnp.zeros((1,), jnp.float32)
