"""Weight loading paths: torch .pth checkpoints via DenoiserLoad (the
reference's pretrained-model flow, diffusion.py:148-153) and flax .npz."""

import sys
from dataclasses import asdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_latent_diffusion_tpu.configs import (
    ClipConfig,
    DenoiserConfig,
    DenoiserLoad,
    LTDConfig,
    VaeConfig,
    reference_denoiser_kwargs,
)

try:
    sys.path.insert(0, "/root/reference")
    import torch
    from tld.denoiser import Denoiser as TorchDenoiser

    HAVE_REFERENCE = True
except Exception:  # pragma: no cover
    HAVE_REFERENCE = False


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference/torch unavailable")
def test_diffusion_transformer_loads_torch_checkpoint(tmp_path):
    cfg_d = DenoiserConfig()
    torch.manual_seed(3)
    tmodel = TorchDenoiser(**reference_denoiser_kwargs(cfg_d))
    ckpt = str(tmp_path / "weights.pth")
    torch.save(tmodel.state_dict(), ckpt)

    cfg = LTDConfig(
        denoiser_cfg=cfg_d,
        denoiser_load=DenoiserLoad(local_filename=ckpt),
        vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
        clip_cfg=ClipConfig(width=64, heads=2, layers=2),
        use_pallas=False,
    )
    from transformer_latent_diffusion_tpu.sampling import DiffusionTransformer

    dt = DiffusionTransformer(cfg)
    # loaded params must match the torch weights (spot check one tensor)
    got = np.asarray(dt.diffuser.params["label_proj"]["kernel"])
    want = tmodel.label_proj.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=1e-6)

    img = dt.generate_image_from_text("a cute cat", n_iter=3)
    assert img is not None


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference/torch unavailable")
def test_training_style_checkpoint_with_ema_key(tmp_path):
    """Reference training checkpoints wrap weights as {'model_ema': ...}
    (train.py:151-155); the loader unwraps them."""
    from transformer_latent_diffusion_tpu.sampling.pipeline import (
        load_denoiser_params,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser

    cfg_d = DenoiserConfig()
    tmodel = TorchDenoiser(**reference_denoiser_kwargs(cfg_d))
    ckpt = str(tmp_path / "full_state.pth")
    torch.save({"model_ema": tmodel.state_dict(), "opt_state": {},
                "global_step": 7}, ckpt)

    model = Denoiser(**asdict(cfg_d))
    params = load_denoiser_params(ckpt, model, cfg_d)
    got = np.asarray(params["label_proj"]["kernel"])
    want = tmodel.label_proj.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_npz_roundtrip(tmp_path):
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.checkpoint import (
        save_npz,
        unflatten_npz,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg_d = DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                           noise_embed_dims=64)
    model = Denoiser(**asdict(cfg_d))
    params = init_denoiser_params(model, cfg_d)
    path = str(tmp_path / "w.npz")
    save_npz(path, params)
    restored = unflatten_npz(path)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    for kp, leaf in flat_a:
        node = restored
        for k in kp:
            node = node[k.key]
        np.testing.assert_array_equal(np.asarray(leaf), node)


def test_safetensors_reader_roundtrip(tmp_path):
    """Pure-numpy .safetensors reader: hand-write the format (8-byte u64
    header length + JSON header + raw buffer) incl. a BF16 tensor and
    read it back exactly."""
    import json

    import ml_dtypes

    from transformer_latent_diffusion_tpu.models.torch_compat import (
        read_safetensors,
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((2, 2, 2)).astype(np.float16)
    c = rng.standard_normal((5,)).astype(ml_dtypes.bfloat16)

    bufs = [a.tobytes(), b.tobytes(), c.tobytes()]
    offs, header, pos = [], {}, 0
    for name, arr, dt, raw in [("a", a, "F32", bufs[0]),
                               ("b", b, "F16", bufs[1]),
                               ("c", c, "BF16", bufs[2])]:
        header[name] = {"dtype": dt, "shape": list(arr.shape),
                        "data_offsets": [pos, pos + len(raw)]}
        pos += len(raw)
    header["__metadata__"] = {"format": "pt"}
    hj = json.dumps(header).encode()
    path = tmp_path / "w.safetensors"
    with open(path, "wb") as f:
        f.write(len(hj).to_bytes(8, "little"))
        f.write(hj)
        for raw in bufs:
            f.write(raw)

    out = read_safetensors(str(path))
    np.testing.assert_array_equal(out["a"], a)
    np.testing.assert_array_equal(out["b"], b)
    assert out["c"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(out["c"].astype(np.float32),
                                  c.astype(np.float32))
    assert "__metadata__" not in out


def test_safetensors_writer_roundtrip(tmp_path):
    """write_safetensors is the exact inverse of read_safetensors: mixed
    dtypes (incl. bf16) survive, metadata is emitted, and the data
    section is 8-byte aligned per the spec (space-padded header)."""
    import json

    import ml_dtypes

    from transformer_latent_diffusion_tpu.models.torch_compat import (
        read_safetensors,
        write_safetensors,
    )

    rng = np.random.default_rng(1)
    tensors = {
        "a": rng.standard_normal((3, 5)).astype(np.float32),
        "b": rng.standard_normal((2, 2, 2)).astype(np.float16),
        "c": rng.standard_normal((7,)).astype(ml_dtypes.bfloat16),
        "d": rng.integers(0, 255, (4,), dtype=np.uint8),
    }
    path = tmp_path / "w.safetensors"
    write_safetensors(tensors, str(path), metadata={"format": "pt"})

    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        assert (8 + n) % 8 == 0  # data section aligned
        header = json.loads(f.read(n))
    assert header["__metadata__"] == {"format": "pt"}

    out = read_safetensors(str(path))
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        assert out[k].dtype == v.dtype
        np.testing.assert_array_equal(
            out[k].astype(np.float32), v.astype(np.float32))


def test_export_safetensors_reloads_exactly(tmp_path):
    """Full torch-free interchange loop: flax tree -> torch-layout dict
    -> .safetensors on disk -> load_denoiser_params -> identical tree."""
    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models.denoiser import Denoiser
    from transformer_latent_diffusion_tpu.models.torch_compat import (
        export_torch_denoiser_state_dict,
        write_safetensors,
    )
    from transformer_latent_diffusion_tpu.sampling.pipeline import (
        load_denoiser_params,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig()
    model = Denoiser(**cfg.__dict__)
    params = init_denoiser_params(model, cfg)

    sd = export_torch_denoiser_state_dict(params, cfg)
    path = tmp_path / "export.safetensors"
    write_safetensors(sd, str(path), metadata={"format": "pt"})

    loaded = load_denoiser_params(str(path), model, cfg)
    assert jax.tree.structure(loaded) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-6)


def test_safetensors_flat_ema_prefix(tmp_path):
    """A flattened EMA checkpoint ('model_ema.'-prefixed keys, the shape
    a .pth {model_ema: ...} takes after safetensors flattening) must
    load through load_denoiser_params."""
    if not HAVE_REFERENCE:
        import pytest

        pytest.skip("reference torch model unavailable")
    import json

    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models.denoiser import Denoiser
    from transformer_latent_diffusion_tpu.sampling.pipeline import (
        load_denoiser_params,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig()
    tm = TorchDenoiser(**{
        "image_size": cfg.image_size, "noise_embed_dims": cfg.noise_embed_dims,
        "patch_size": cfg.patch_size, "embed_dim": cfg.embed_dim,
        "dropout": 0, "n_layers": cfg.n_layers})
    sd = {f"model_ema.{k}": v.detach().numpy() for k, v in
          tm.state_dict().items()}

    bufs, header, pos = [], {}, 0
    for name, arr in sd.items():
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        raw = arr.tobytes()
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [pos, pos + len(raw)]}
        bufs.append(raw)
        pos += len(raw)
    hj = json.dumps(header).encode()
    path = tmp_path / "ema.safetensors"
    with open(path, "wb") as f:
        f.write(len(hj).to_bytes(8, "little"))
        f.write(hj)
        for raw in bufs:
            f.write(raw)

    model = Denoiser(**cfg.__dict__)
    params = load_denoiser_params(str(path), model, cfg)
    # loaded tree must match the model's own param structure
    ref = init_denoiser_params(model, cfg)
    assert jax.tree.structure(params) == jax.tree.structure(ref)


def test_hf_clip_converter_matches_transformers(tmp_path):
    """convert_hf_clip_state_dict + npz round-trip: our Flax text tower
    must reproduce transformers' CLIPModel.get_text_features on a tiny
    random model (the converter path scripts/convert_towers.py uses for
    openai/clip-vit-large-patch14)."""
    transformers = pytest.importorskip("transformers")
    import torch as _torch

    tcfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=49408, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, hidden_act="quick_gelu"),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, image_size=32, patch_size=16),
        projection_dim=64,
    )
    _torch.manual_seed(0)
    tm = transformers.CLIPModel(tcfg).eval()

    from transformer_latent_diffusion_tpu.models.clip import ClipTextModel
    from transformer_latent_diffusion_tpu.models.torch_compat import (
        convert_hf_clip_state_dict,
        load_clip_params,
    )
    from transformer_latent_diffusion_tpu.train.checkpoint import save_npz

    params = convert_hf_clip_state_dict(tm.state_dict(), layers=2)
    path = str(tmp_path / "clip.npz")
    save_npz(path, params)
    reloaded = load_clip_params(path, ClipConfig(width=64, heads=2, layers=2,
                                                 embed_dim=64))

    tokens = np.zeros((2, 77), np.int32)
    tokens[0, :4] = [1, 5, 7, 49407]
    tokens[1, :6] = [1, 9, 8, 3, 2, 49407]
    module = ClipTextModel(width=64, heads=2, layers=2, embed_dim=64)
    got = np.asarray(module.apply({"params": reloaded},
                                  jnp.asarray(tokens)))
    with _torch.no_grad():
        want = tm.get_text_features(
            input_ids=_torch.tensor(tokens, dtype=_torch.long)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_openai_clip_text_converter_oracle(tmp_path):
    """convert_torch_clip_state_dict (the openai TorchScript layout —
    the exact artifact the reference loads via clip.load('ViT-L/14'),
    reference diffusion.py:160) against a hand-rolled torch oracle of
    openai's text graph: token embed + pos embed, pre-LN causal
    resblocks (nn.MultiheadAttention => in_proj_weight/out_proj keys,
    QuickGELU MLP), ln_final, EOT pooling, text_projection matmul
    (VERDICT r3 #4; mirrors the HF-layout oracle above)."""
    _torch = pytest.importorskip("torch")
    import torch.nn as tnn

    width, heads, layers, embed_dim, ctx, vocab = 64, 2, 2, 48, 77, 49408

    class QuickGELU(tnn.Module):
        def forward(self, x):
            return x * _torch.sigmoid(1.702 * x)

    class Resblock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(width)
            self.attn = tnn.MultiheadAttention(width, heads)
            self.ln_2 = tnn.LayerNorm(width)
            import collections

            self.mlp = tnn.Sequential(collections.OrderedDict([
                ("c_fc", tnn.Linear(width, 4 * width)),
                ("gelu", QuickGELU()),
                ("c_proj", tnn.Linear(4 * width, width)),
            ]))

        def forward(self, x, mask):
            h = self.ln_1(x)
            a, _ = self.attn(h, h, h, need_weights=False, attn_mask=mask)
            x = x + a
            return x + self.mlp(self.ln_2(x))

    class Transformer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.resblocks = tnn.ModuleList(Resblock() for _ in range(layers))

        def forward(self, x, mask):
            for b in self.resblocks:
                x = b(x, mask)
            return x

    class OpenaiTextTower(tnn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = tnn.Embedding(vocab, width)
            self.positional_embedding = tnn.Parameter(
                0.01 * _torch.randn(ctx, width))
            self.transformer = Transformer()
            self.ln_final = tnn.LayerNorm(width)
            self.text_projection = tnn.Parameter(
                width ** -0.5 * _torch.randn(width, embed_dim))

        def forward(self, text):
            x = self.token_embedding(text) + self.positional_embedding
            # openai's additive causal mask (-inf above the diagonal),
            # seq-first MultiheadAttention
            n = text.shape[1]
            mask = _torch.full((n, n), float("-inf")).triu(1)
            x = self.transformer(x.permute(1, 0, 2), mask).permute(1, 0, 2)
            x = self.ln_final(x)
            eot = text.argmax(dim=-1)
            return x[_torch.arange(x.shape[0]), eot] @ self.text_projection

    _torch.manual_seed(0)
    tower = OpenaiTextTower().eval()
    sd = tower.state_dict()
    # exactly the openai key set the converter advertises
    assert "transformer.resblocks.0.attn.in_proj_weight" in sd
    assert "text_projection" in sd

    from transformer_latent_diffusion_tpu.models.clip import ClipTextModel
    from transformer_latent_diffusion_tpu.models.torch_compat import (
        convert_torch_clip_state_dict,
    )

    params = convert_torch_clip_state_dict(
        {k: v for k, v in sd.items()}, layers=layers)

    tokens = np.zeros((2, ctx), np.int32)
    tokens[0, :4] = [1, 5, 7, 49407]
    tokens[1, :6] = [1, 9, 8, 3, 2, 49407]
    module = ClipTextModel(width=width, heads=heads, layers=layers,
                           embed_dim=embed_dim)
    got = np.asarray(module.apply({"params": params}, jnp.asarray(tokens)))
    with _torch.no_grad():
        want = tower(_torch.tensor(tokens, dtype=_torch.long)).numpy()
    assert got.shape == want.shape == (2, embed_dim)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_clip_weights_without_vocab_warns():
    """Real CLIP weights + HashTokenizer stub is a silently-garbage
    config; FlaxClip.create must warn loudly."""
    import warnings

    from transformer_latent_diffusion_tpu.models.clip import FlaxClip

    tiny = FlaxClip.create(width=32, heads=2, layers=1, embed_dim=32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        FlaxClip.create(width=32, heads=2, layers=1, embed_dim=32,
                        params=tiny.params)
    assert any("vocab" in str(w.message) for w in rec), rec
