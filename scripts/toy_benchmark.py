"""Shared hermetic quality benchmark for the knob probes (VERDICT r3 #9).

The round-3 probes (probe_objective_quality / probe_sampler_quality /
probe_guidance_quality) each inlined the same 8-point-cluster dataset and
scored with latent-FID on raw flattened latents. That setup was too weak
to give verdicts on small-effect knobs (min_snr measured "neutral",
offset_noise had no number at all). This module is the strengthened
common setup:

  * 32 classes x low-rank within-class structure: each class is
    mu_k + A_k z (rank-8 factors) + small isotropic noise, so FID's
    covariance term carries signal — a model that collapses class
    variance scores worse even when it nails the means.
  * 4096 train samples / 1024 eval samples (vs 512/512).
  * TWO feature spaces per score: latent-FID (flattened latents,
    comparable to the round-3 tables) and CLIP-FID via the in-repo CLIP
    image tower (fixed-seed random-init ClipVisionModel over fixed-seed
    tiny-VAE decodes — random-feature FID: every variant shares the
    extractor, so relative comparisons are valid; absolute numbers are
    not literature-comparable until real weights are converted).
  * error bars: K eval replicates (different eval class draws, truth
    draws, and sampling seeds) -> mean +- std per variant.

Everything is deterministic from the seeds below; no downloads.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import replace

import numpy as np

IMG = 16          # latent grid (4, IMG, IMG)
N_CLASSES = 32
RANK = 8
N_DATA = 4096
N_EVAL = 1024
N_REPLICATES = 3
DATA_SEED = 0
EVAL_SEED = 1042  # base; replicate i uses EVAL_SEED + i


class Benchmark:
    """Deterministic class-conditional latent distribution."""

    def __init__(self, n_classes: int = N_CLASSES, img: int = IMG,
                 rank: int = RANK, seed: int = DATA_SEED):
        self.n_classes, self.img, self.rank = n_classes, img, rank
        rng = np.random.default_rng(seed)
        d = 4 * img * img
        self.mus = rng.standard_normal(
            (n_classes, 4, img, img)).astype(np.float32)
        # unit per-dim within-class variance from the factors
        self.factors = (rng.standard_normal((n_classes, rank, d))
                        / np.sqrt(rank)).astype(np.float32)
        self.embs = rng.standard_normal((n_classes, 768)).astype(np.float32)

    def sample(self, cls_idx: np.ndarray, rng: np.random.Generator):
        """Draw latents from the generating distribution for `cls_idx`."""
        n = len(cls_idx)
        z = rng.standard_normal((n, self.rank)).astype(np.float32)
        lowrank = np.einsum("nr,nrd->nd", z, self.factors[cls_idx])
        lowrank = lowrank.reshape(n, 4, self.img, self.img)
        eps = rng.standard_normal((n, 4, self.img, self.img))
        return (self.mus[cls_idx] + 0.35 * lowrank
                + 0.05 * eps).astype(np.float32)

    # ------------------------------------------------------------ data --
    def write_dataset(self, out_dir: str, n_data: int = N_DATA):
        """latents.npy (x8 pre-vae scale, /8 in the train loop) +
        text.npy + val.npy; returns the three paths."""
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.default_rng(DATA_SEED + 7)
        cls = rng.integers(0, self.n_classes, size=n_data)
        latents = self.sample(cls, rng)
        text = (self.embs[cls]
                + 0.05 * rng.standard_normal((n_data, 768))).astype(
                    np.float32)
        lp = os.path.join(out_dir, "latents.npy")
        tp = os.path.join(out_dir, "text.npy")
        vp = os.path.join(out_dir, "val.npy")
        np.save(lp, latents * 8.0)
        np.save(tp, text)
        np.save(vp, self.embs[:8])
        return lp, tp, vp

    def eval_set(self, replicate: int, n_eval: int = N_EVAL):
        """(labels (N,768), truth latents (N,4,S,S), sampling_seed) for
        one replicate — class draw, truth draw and sampler seed all vary
        with the replicate index."""
        rng = np.random.default_rng(EVAL_SEED + replicate)
        cls = rng.integers(0, self.n_classes, size=n_eval)
        return self.embs[cls], self.sample(cls, rng), 7 + replicate


# ------------------------------------------------------------ features --

def latent_features(lat: np.ndarray) -> np.ndarray:
    return np.asarray(lat, np.float32).reshape(lat.shape[0], -1)


_CLIP_STACK = {}


def clip_features_fn(img: int = IMG, seed: int = 0):
    """latents (N,4,S,S) -> CLIP image features via a FIXED random-init
    tiny VAE decode + the in-repo ClipVisionModel (random-feature
    CLIP-FID). Cached per (img, seed); every caller shares the exact
    extractor so FIDs are comparable across variants and probes.

    Extractor calibration (measured, CPU): the random VAE decodes to
    roughly +-3.6, so a hard [-1,1] clip destroyed most pixels — tanh
    squash instead; and a DEEP random ViT collapses inputs (per-dim
    feature std 3e-4 against a constant component of norm ~29, FID
    floor == signal == 0), so the tower is 2 layers and
    score_replicates standardizes features against the truth set's
    per-dim statistics. With both fixes the metric separates cleanly:
    same-distribution floor 35 << 20%-corruption 104 << pure-noise 382."""
    key = (img, seed)
    if key not in _CLIP_STACK:
        from transformer_latent_diffusion_tpu.models.clip import FlaxClipVision
        from transformer_latent_diffusion_tpu.models.vae import FlaxVae

        vae = FlaxVae.create(block_out_channels=(8, 16), layers_per_block=1,
                             seed=seed)
        vision = FlaxClipVision.create(image_size=2 * img, patch_size=4,
                                       width=128, heads=4, layers=2,
                                       seed=seed)
        _CLIP_STACK[key] = (vae, vision)
    vae, vision = _CLIP_STACK[key]

    from transformer_latent_diffusion_tpu.utils.clip_eval import (
        clip_image_features,
    )

    def feats(lat: np.ndarray, batch: int = 256) -> np.ndarray:
        out = []
        for i in range(0, lat.shape[0], batch):
            imgs = np.asarray(vae.decode(
                np.asarray(lat[i: i + batch], np.float32)))
            imgs = np.tanh(imgs / 2.0)  # smooth squash, no hard clip
            imgs = np.transpose(imgs, (0, 2, 3, 1))  # NCHW -> NHWC float
            # explicit pm1: tanh output is [-1,1] by construction, and
            # per-chunk auto-detection could scale chunks inconsistently
            out.append(clip_image_features(imgs, vision, batch_size=256,
                                           input_range="pm1"))
        return np.concatenate(out, axis=0)

    return feats


# ------------------------------------------------------- train helpers --

def train_or_load(name: str, dcfg, data_paths, ckpt_dir: str,
                  epochs: int = 24, batch: int = 64, lr: float = 2e-3,
                  extra_buckets=(), **tcfg_kwargs):
    """train.main a variant (or load its cached EMA params); returns
    (params, losses-or-None). Cache key = `name` inside ckpt_dir —
    delete the .pkl to retrain. `extra_buckets` is a sequence of
    (latents.npy, text.npy) pairs for multi-resolution bucketed
    training (DataConfig.extra_latent_paths)."""
    import jax

    from transformer_latent_diffusion_tpu.configs import (
        DataConfig,
        ModelConfig,
        TrainConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.train import main as train_main

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{name}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f), None
    lp, tp, vp = data_paths
    cfg = ModelConfig(
        data_config=DataConfig(
            lp, tp, vp,
            extra_latent_paths=tuple(b[0] for b in extra_buckets),
            extra_text_emb_paths=tuple(b[1] for b in extra_buckets)),
        denoiser_config=dcfg,
        train_config=TrainConfig(
            n_epoch=epochs, batch_size=batch, lr=lr, save_model=False,
            use_wandb=False, save_and_eval_every_iters=10 ** 9,
            checkpoint_dir=ckpt_dir, compute_dtype="float32",
            **tcfg_kwargs),
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
    )
    result = train_main(cfg)
    params = jax.device_get(result["state"]["ema_params"])
    with open(path, "wb") as f:
        pickle.dump(params, f)
    return params, result["losses"]


def score_replicates(bench: Benchmark, sample_fn, n_eval: int = N_EVAL,
                     n_replicates: int = N_REPLICATES,
                     clip_feats=None) -> dict:
    """Run `sample_fn(labels, seed) -> latents (N,4,S,S)` once per
    replicate and score latent-FID + CLIP-FID + MSE-to-class-mean
    against fresh truth draws; returns mean/std per metric."""
    from transformer_latent_diffusion_tpu.utils.fid import compute_fid

    if clip_feats is None:
        clip_feats = clip_features_fn(bench.img)
    lat_fids, clip_fids, mses = [], [], []
    # the truth-feature cache lives ON the clip_feats closure, so its
    # lifetime is tied to the extractor: keying a bench-level dict by
    # id(clip_feats) risked a stale hit when a GC'd closure's id was
    # reused by a different extractor (ADVICE r4)
    truth_cache = getattr(clip_feats, "_truth_feat_cache", None)
    if truth_cache is None:
        truth_cache = {}
        clip_feats._truth_feat_cache = truth_cache
    for rep in range(n_replicates):
        labels, truth, seed = bench.eval_set(rep, n_eval)
        lat = np.asarray(sample_fn(labels, seed), np.float32)
        lat_fids.append(compute_fid(latent_features(truth),
                                    latent_features(lat)))
        # standardize against the truth set's per-dim stats: the random
        # tower's output is a tiny signal on a large constant component,
        # and FID on the raw features is numerically dead (see
        # clip_features_fn docstring)
        key = (rep, n_eval)
        if key not in truth_cache:
            # the truth set is deterministic per (rep, n_eval) — every
            # variant in a probe shares it, so extract its features once
            truth_cache[key] = clip_feats(truth)
        ft = truth_cache[key]
        mu, sd = ft.mean(0), ft.std(0) + 1e-6
        z = lambda f: (f - mu) / sd  # noqa: E731
        clip_fids.append(compute_fid(z(ft), z(clip_feats(lat))))
        mses.append(float(np.mean((lat - truth) ** 2)))
    agg = lambda v: (round(float(np.mean(v)), 4),  # noqa: E731
                     round(float(np.std(v)), 4))
    lm, ls = agg(lat_fids)
    cm, cs = agg(clip_fids)
    mm, ms = agg(mses)
    return {"latent_fid": lm, "latent_fid_std": ls,
            "clip_fid": cm, "clip_fid_std": cs,
            "mse": mm, "mse_std": ms}


def base_denoiser_cfg():
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig

    return DenoiserConfig(image_size=IMG, embed_dim=128, n_layers=3,
                          noise_embed_dims=128)


def make_sampler(dcfg, params, fast_apply_factory=None, **gen_kwargs):
    """sample_fn(labels, seed) closure over a DiffusionGenerator.
    `fast_apply_factory(model) -> apply_fn` reaches the generator ctor
    (e.g. train.consistency_apply for a distilled student)."""
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator

    model = Denoiser(**dcfg.__dict__)
    gen = DiffusionGenerator(
        model=model, params=params, vae=None,
        fast_apply=fast_apply_factory(model) if fast_apply_factory else None)
    defaults = dict(num_imgs=N_EVAL, img_size=IMG, n_iter=50,
                    class_guidance=3.0, sharp_f=0, bright_f=0,
                    use_ddpm_plus=False, scale_factor=1.0)
    defaults.update(gen_kwargs)

    def sample(labels, seed):
        import jax.numpy as jnp

        kw = dict(defaults)
        kw["num_imgs"] = len(labels)
        _, lat = gen.generate(labels=jnp.asarray(labels), seed=seed, **kw)
        return np.asarray(lat, np.float32)

    return sample
