"""GCN EI-MS spectrum predictor — TPU-native port of the reference trainer.

Reference: templates/ms-pred-gcn-eims-cupy.py (PyTorch + DGL + CuPy,
SURVEY.md §2.1 row 12 / §3.5). TPU-first redesign:
 - graphs are dense padded batches: node features [B, N, F] and a
   symmetrically-normalized adjacency [B, N, N]; message passing is a plain
   batched matmul — exactly the MXU-friendly formulation SURVEY.md §2.2
   prescribes in place of DGL's SpMM;
 - parameters/optimizer are pure pytrees (optax AdamW + OneCycle schedule,
   mirroring the reference's AdamW + OneCycleLR, :385-391);
 - mixed precision = bf16 activations with f32 params/accumulation (the
   reference's torch.cuda.amp analog);
 - the batch axis shards over the mesh 'data' axis (DP), the hidden dim of
   the MLP head over 'model' (TP) — see parallel/mesh.py.

Model hyperparameters mirror the reference Config (:73-101): max_mz 500,
hidden 256, 3 GCN layers, dropout 0.2, combined sum||max pooling, 3-layer
MLP head with sigmoid.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class GCNConfig:
    num_atom_features: int = 6
    hidden_dim: int = 256
    num_layers: int = 3
    max_mz: int = 500
    dropout: float = 0.2
    pooling: str = "combined"        # sum | mean | max | combined
    batch_size: int = 64
    epochs: int = 100
    lr: float = 1e-3
    weight_decay: float = 1e-4
    max_nodes: int = 64
    bf16: bool = True
    seed: int = 42


def init_params(key, cfg: GCNConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 16)
    p = {}
    dims = [cfg.num_atom_features] + [cfg.hidden_dim] * cfg.num_layers
    for i in range(cfg.num_layers):
        fan_in = dims[i]
        p[f"gcn{i}_w"] = (jax.random.normal(ks[i], (dims[i], dims[i + 1]))
                          * jnp.sqrt(2.0 / fan_in))
        p[f"gcn{i}_b"] = jnp.zeros(dims[i + 1])
        p[f"bn{i}_scale"] = jnp.ones(dims[i + 1])
        p[f"bn{i}_bias"] = jnp.zeros(dims[i + 1])
    pool_dim = cfg.hidden_dim * (2 if cfg.pooling == "combined" else 1)
    head = [pool_dim, cfg.hidden_dim * 2, cfg.hidden_dim, cfg.max_mz]
    for i in range(3):
        p[f"mlp{i}_w"] = (jax.random.normal(ks[8 + i], (head[i], head[i + 1]))
                          * jnp.sqrt(2.0 / head[i]))
        p[f"mlp{i}_b"] = jnp.zeros(head[i + 1])
    return p


def init_bn_state(cfg: GCNConfig) -> Dict[str, Any]:
    return {f"bn{i}_{k}": (jnp.zeros(cfg.hidden_dim) if k == "mean"
                           else jnp.ones(cfg.hidden_dim))
            for i in range(cfg.num_layers) for k in ("mean", "var")}


def normalized_adjacency(adj, mask):
    """A_hat = D^-1/2 (A + I) D^-1/2 restricted to real nodes."""
    n = adj.shape[-1]
    eye = jnp.eye(n)
    a = (adj + eye) * mask[..., None, :] * mask[..., :, None]
    deg = jnp.sum(a, axis=-1)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    return a * dinv[..., None, :] * dinv[..., :, None]


def apply_model(params, bn_state, cfg: GCNConfig, feats, adj, mask,
                train: bool = False, rng=None):
    """Forward pass.

    feats [B,N,F] f32; adj [B,N,N] (0/1); mask [B,N] (1=real node).
    Returns (pred [B, max_mz], new_bn_state).
    """
    cdt = jnp.bfloat16 if cfg.bf16 else jnp.float32
    A = normalized_adjacency(adj, mask).astype(cdt)
    h = feats.astype(cdt)
    new_state = dict(bn_state)
    for i in range(cfg.num_layers):
        h = jnp.einsum("bnm,bmf->bnf", A, h)
        h = h @ params[f"gcn{i}_w"].astype(cdt) + \
            params[f"gcn{i}_b"].astype(cdt)
        h = jax.nn.relu(h)
        # masked batch-norm over (batch, nodes)
        hf = h.astype(jnp.float32)
        m = mask[..., None]
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        if train:
            mean = jnp.sum(hf * m, axis=(0, 1)) / cnt
            var = jnp.sum(((hf - mean) ** 2) * m, axis=(0, 1)) / cnt
            new_state[f"bn{i}_mean"] = (0.9 * bn_state[f"bn{i}_mean"]
                                        + 0.1 * mean)
            new_state[f"bn{i}_var"] = (0.9 * bn_state[f"bn{i}_var"]
                                       + 0.1 * var)
        else:
            mean = bn_state[f"bn{i}_mean"]
            var = bn_state[f"bn{i}_var"]
        hf = (hf - mean) * jax.lax.rsqrt(var + 1e-5)
        hf = hf * params[f"bn{i}_scale"] + params[f"bn{i}_bias"]
        h = (hf * m).astype(cdt)
        if train and cfg.dropout > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1 - cfg.dropout, h.shape)
            h = jnp.where(keep, h / (1 - cfg.dropout), 0.0)

    hsum = jnp.sum(h * mask[..., None].astype(cdt), axis=1)
    hmax = jnp.max(jnp.where(mask[..., None] > 0, h, -jnp.inf), axis=1)
    hmax = jnp.where(jnp.isfinite(hmax), hmax, 0.0)
    if cfg.pooling == "sum":
        g = hsum
    elif cfg.pooling == "mean":
        g = hsum / jnp.maximum(jnp.sum(mask, 1, keepdims=True), 1).astype(cdt)
    elif cfg.pooling == "max":
        g = hmax
    else:
        g = jnp.concatenate([hsum, hmax], axis=-1)

    x = g
    for i in range(3):
        x = x @ params[f"mlp{i}_w"].astype(cdt) + \
            params[f"mlp{i}_b"].astype(cdt)
        if i < 2:
            x = jax.nn.relu(x)
            if train and cfg.dropout > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1 - cfg.dropout, x.shape)
                x = jnp.where(keep, x / (1 - cfg.dropout), 0.0)
    pred = jax.nn.sigmoid(x.astype(jnp.float32))
    return pred, new_state


def cosine_similarity(pred, target, eps: float = 1e-8):
    """Batched spectral cosine similarity (reference CuPySpectrumProcessor
    :207-221 semantics)."""
    num = jnp.sum(pred * target, axis=-1)
    den = (jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1))
    return num / jnp.maximum(den, eps)


def make_optimizer(cfg: GCNConfig, steps_per_epoch: int):
    """AdamW + OneCycle (reference :385-391)."""
    # floor keeps the piecewise-interpolated warmup interval non-degenerate
    # (transition_steps*pct_start < 1 yields a 0-length segment -> NaN lr)
    total = max(20, cfg.epochs * steps_per_epoch)
    sched = optax.cosine_onecycle_schedule(
        transition_steps=total, peak_value=cfg.lr, pct_start=0.3,
        div_factor=25.0, final_div_factor=1e4)
    return optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)


def make_train_step(cfg: GCNConfig, optimizer):
    def loss_fn(params, bn_state, batch, rng):
        pred, new_state = apply_model(params, bn_state, cfg,
                                      batch["feats"], batch["adj"],
                                      batch["mask"], train=True, rng=rng)
        loss = jnp.mean((pred - batch["target"]) ** 2)
        return loss, (new_state, pred)

    @jax.jit
    def train_step(params, bn_state, opt_state, batch, rng):
        (loss, (new_state, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bn_state, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        cos = jnp.mean(cosine_similarity(pred, batch["target"]))
        return params, new_state, opt_state, loss, cos

    return train_step


def make_eval_step(cfg: GCNConfig):
    @jax.jit
    def eval_step(params, bn_state, batch):
        pred, _ = apply_model(params, bn_state, cfg, batch["feats"],
                              batch["adj"], batch["mask"], train=False)
        loss = jnp.mean((pred - batch["target"]) ** 2)
        cos = jnp.mean(cosine_similarity(pred, batch["target"]))
        return loss, cos, pred
    return eval_step
