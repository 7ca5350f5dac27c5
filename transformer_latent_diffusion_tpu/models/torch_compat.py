"""Torch -> Flax weight converters.

Lets this framework load:
  * the published reference denoiser checkpoints (e.g. the 101M
    `state_dict_378000.pth` from huggingface.co/apapiu/small_ldt referenced
    in /root/reference/tests/test_diffuser.py:138) into our Flax Denoiser,
  * a diffusers `AutoencoderKL` state_dict into our Flax VAE,
  * an openai CLIP state_dict (text side) into our Flax text tower.

torch is only imported lazily — the framework itself never depends on it.
All conversions are pure layout transforms (transpose Linear weights,
HWIO-ify convs); numerics are asserted by tests/test_torch_parity.py.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Dependency-free .safetensors reader (no torch / safetensors lib).

    Format: 8-byte little-endian u64 header size, a JSON header mapping
    tensor name -> {dtype, shape, data_offsets=[begin, end]} (offsets
    relative to the end of the header), then the raw byte buffer.
    """
    import json

    dtypes = {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U8": np.uint8, "BOOL": np.bool_,
    }
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
        buf = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        b, e = meta["data_offsets"]
        raw = buf[b:e]
        if meta["dtype"] == "BF16":
            # numpy has no bf16: widen via the ml_dtypes view jax ships
            import ml_dtypes

            arr = np.frombuffer(raw, dtype=ml_dtypes.bfloat16)
        else:
            arr = np.frombuffer(raw, dtype=dtypes[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"])
    return out


def write_safetensors(tensors: Dict[str, np.ndarray], path: str,
                      metadata: Dict[str, str] | None = None) -> None:
    """Dependency-free .safetensors writer (inverse of read_safetensors).

    Emits the standard format (8-byte LE u64 header size, JSON header,
    raw little-endian buffer), so files are loadable by the official
    safetensors library and the HF ecosystem, not just our reader. The
    header is space-padded to an 8-byte multiple per the spec so the
    data section is aligned. bf16 arrays (ml_dtypes) are supported."""
    import json

    names = {
        "float64": "F64", "float32": "F32", "float16": "F16",
        "int64": "I64", "int32": "I32", "int16": "I16", "int8": "I8",
        "uint8": "U8", "bool": "BOOL", "bfloat16": "BF16",
    }
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    blobs = []
    off = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        key = names.get(arr.dtype.name)
        if key is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name!r}")
        raw = arr.tobytes()
        header[name] = {"dtype": key, "shape": list(arr.shape),
                        "data_offsets": [off, off + len(raw)]}
        off += len(raw)
        blobs.append(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    hjson += b" " * (-(8 + len(hjson)) % 8)
    tmp = f"{path}.part"
    with open(tmp, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for raw in blobs:
            f.write(raw)
    import os

    os.replace(tmp, path)


def load_state_dict_file(path: str) -> Dict[str, Any]:
    """Load a checkpoint file into a flat name->array dict.

    `.safetensors` parses with the pure-numpy reader above (works in
    torch-free deployments); anything else goes through torch.load."""
    if path.endswith(".safetensors"):
        return read_safetensors(path)
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        # openai CLIP publishes TorchScript archives (e.g. ViT-L/14.pt)
        # that torch.load cannot unpickle
        sd = torch.jit.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _linear(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _conv(sd, name):
    # torch OIHW -> flax HWIO
    w = _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)
    return {"kernel": w, "bias": _np(sd[f"{name}.bias"])}


def _strip_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    # torch.compile checkpoints carry an `_orig_mod.` prefix
    return { (k[len("_orig_mod."):] if k.startswith("_orig_mod.") else k): v
             for k, v in sd.items() }


def convert_torch_denoiser_state_dict(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Reference `Denoiser` torch state_dict -> our Flax param tree.

    cfg: DenoiserConfig (for patch/channel shapes).
    """
    sd = _strip_prefix(sd)
    p = cfg.patch_size
    c = cfg.n_channels
    patch_dim = c * p * p

    params: Dict[str, Any] = {
        "fourier_dense1": _linear(sd, "fourier_feats.1"),
        "fourier_dense2": _linear(sd, "fourier_feats.3"),
        "label_proj": _linear(sd, "label_proj"),
        "cond_norm": _ln(sd, "norm"),
    }

    tb: Dict[str, Any] = {}
    # patchify conv (patch_dim, C, p, p) == per-patch linear over (c,p1,p2)
    conv_w = _np(sd["denoiser_trans_block.patchify_and_embed.0.weight"])
    tb["patch_proj"] = {
        "kernel": conv_w.reshape(patch_dim, patch_dim).T,
        "bias": _np(sd["denoiser_trans_block.patchify_and_embed.0.bias"]),
    }
    tb["patch_norm1"] = _ln(sd, "denoiser_trans_block.patchify_and_embed.2")
    tb["embed_proj"] = _linear(sd, "denoiser_trans_block.patchify_and_embed.3")
    tb["patch_norm2"] = _ln(sd, "denoiser_trans_block.patchify_and_embed.4")
    tb["pos_embed"] = _np(sd["denoiser_trans_block.pos_embed.weight"])

    i = 0
    while f"denoiser_trans_block.decoder_blocks.{i}.norm1.weight" in sd:
        base = f"denoiser_trans_block.decoder_blocks.{i}"
        hidden_w = _np(sd[f"{base}.mlp.mlp.0.weight"])  # (hidden, d, 1, 1)
        dw_w = _np(sd[f"{base}.mlp.mlp.1.weight"])      # (hidden, 1, 3, 3)
        out_w = _np(sd[f"{base}.mlp.mlp.3.weight"])     # (d, hidden, 1, 1)
        tb[f"decoder_block_{i}"] = {
            "self_attention": {"qkv_linear": _linear(sd, f"{base}.self_attention.qkv_linear")},
            "cross_attention": {
                "q_linear": _linear(sd, f"{base}.cross_attention.q_linear"),
                "kv_linear": _linear(sd, f"{base}.cross_attention.kv_linear"),
            },
            "mlp": {
                "expand": {
                    "kernel": hidden_w[:, :, 0, 0].T,
                    "bias": _np(sd[f"{base}.mlp.mlp.0.bias"]),
                },
                "depthwise_kernel": dw_w.transpose(2, 3, 1, 0),  # (3,3,1,hidden)
                "depthwise_bias": _np(sd[f"{base}.mlp.mlp.1.bias"]),
                "contract": {
                    "kernel": out_w[:, :, 0, 0].T,
                    "bias": _np(sd[f"{base}.mlp.mlp.3.bias"]),
                },
            },
            "norm1": _ln(sd, f"{base}.norm1"),
            "norm2": _ln(sd, f"{base}.norm2"),
            "norm3": _ln(sd, f"{base}.norm3"),
        }
        i += 1

    tb["out_proj"] = _linear(sd, "denoiser_trans_block.out_proj.0")
    params["denoiser_trans_block"] = tb
    return params


def export_torch_denoiser_state_dict(params: Dict[str, Any],
                                     cfg) -> Dict[str, np.ndarray]:
    """Our Flax denoiser param tree -> a reference-`Denoiser` torch-layout
    state_dict (exact inverse of `convert_torch_denoiser_state_dict`), so
    a TPU-trained model deploys on the reference torch stack
    (reference denoiser.py:85-126; load path diffusion.py:148-153).

    Returns numpy float32 arrays keyed by the reference's names; wrap with
    `{k: torch.from_numpy(v) for ...}` for `load_state_dict`."""
    p_sz = cfg.patch_size
    c = cfg.n_channels
    patch_dim = c * p_sz * p_sz

    def arr(x):
        return np.asarray(x, dtype=np.float32)

    def lin(out, name, leaf):
        out[f"{name}.weight"] = arr(leaf["kernel"]).T
        if "bias" in leaf:
            out[f"{name}.bias"] = arr(leaf["bias"])

    def ln(out, name, leaf):
        out[f"{name}.weight"] = arr(leaf["scale"])
        out[f"{name}.bias"] = arr(leaf["bias"])

    sd: Dict[str, np.ndarray] = {}
    # the reference registers two deterministic (non-learned) buffers that
    # strict load_state_dict expects: the sinusoidal angular speeds
    # (transformer_blocks.py:11-15) and the pos-embed index table
    # (denoiser.py:55)
    half = cfg.noise_embed_dims // 2
    sd["fourier_feats.0.angular_speeds"] = (
        2.0 * np.pi * np.exp(np.linspace(np.log(1.0), np.log(1000.0), half))
    ).astype(np.float32)
    seq_len = (cfg.image_size // p_sz) ** 2
    sd["denoiser_trans_block.precomputed_pos_enc"] = np.arange(
        seq_len, dtype=np.int64)

    lin(sd, "fourier_feats.1", params["fourier_dense1"])
    lin(sd, "fourier_feats.3", params["fourier_dense2"])
    lin(sd, "label_proj", params["label_proj"])
    ln(sd, "norm", params["cond_norm"])

    tb = params["denoiser_trans_block"]
    sd["denoiser_trans_block.patchify_and_embed.0.weight"] = (
        arr(tb["patch_proj"]["kernel"]).T.reshape(patch_dim, c, p_sz, p_sz))
    sd["denoiser_trans_block.patchify_and_embed.0.bias"] = arr(
        tb["patch_proj"]["bias"])
    ln(sd, "denoiser_trans_block.patchify_and_embed.2", tb["patch_norm1"])
    lin(sd, "denoiser_trans_block.patchify_and_embed.3", tb["embed_proj"])
    ln(sd, "denoiser_trans_block.patchify_and_embed.4", tb["patch_norm2"])
    sd["denoiser_trans_block.pos_embed.weight"] = arr(tb["pos_embed"])

    i = 0
    while f"decoder_block_{i}" in tb:
        blk = tb[f"decoder_block_{i}"]
        base = f"denoiser_trans_block.decoder_blocks.{i}"
        lin(sd, f"{base}.self_attention.qkv_linear",
            blk["self_attention"]["qkv_linear"])
        lin(sd, f"{base}.cross_attention.q_linear",
            blk["cross_attention"]["q_linear"])
        lin(sd, f"{base}.cross_attention.kv_linear",
            blk["cross_attention"]["kv_linear"])
        mlp = blk["mlp"]
        sd[f"{base}.mlp.mlp.0.weight"] = (
            arr(mlp["expand"]["kernel"]).T[:, :, None, None])
        sd[f"{base}.mlp.mlp.0.bias"] = arr(mlp["expand"]["bias"])
        sd[f"{base}.mlp.mlp.1.weight"] = (
            arr(mlp["depthwise_kernel"]).transpose(3, 2, 0, 1))
        sd[f"{base}.mlp.mlp.1.bias"] = arr(mlp["depthwise_bias"])
        sd[f"{base}.mlp.mlp.3.weight"] = (
            arr(mlp["contract"]["kernel"]).T[:, :, None, None])
        sd[f"{base}.mlp.mlp.3.bias"] = arr(mlp["contract"]["bias"])
        ln(sd, f"{base}.norm1", blk["norm1"])
        ln(sd, f"{base}.norm2", blk["norm2"])
        ln(sd, f"{base}.norm3", blk["norm3"])
        i += 1

    lin(sd, "denoiser_trans_block.out_proj.0", tb["out_proj"])
    return sd


# ------------------------------ VAE ----------------------------------------


def convert_torch_vae_state_dict(sd: Dict[str, Any], block_out_channels,
                                 layers_per_block: int) -> Dict[str, Any]:
    """diffusers AutoencoderKL state_dict -> our Flax param tree."""
    sd = _strip_prefix(sd)

    def _gn(name):
        return _ln(sd, name)

    def resnet(src, has_shortcut):
        out = {
            "norm1": _gn(f"{src}.norm1"),
            "conv1": _conv(sd, f"{src}.conv1"),
            "norm2": _gn(f"{src}.norm2"),
            "conv2": _conv(sd, f"{src}.conv2"),
        }
        if has_shortcut:
            out["conv_shortcut"] = _conv(sd, f"{src}.conv_shortcut")
        return out

    def mid(src):
        return {
            "resnet_0": resnet(f"{src}.resnets.0", False),
            "resnet_1": resnet(f"{src}.resnets.1", False),
            "attn": {
                "group_norm": _gn(f"{src}.attentions.0.group_norm"),
                "to_q": _linear(sd, f"{src}.attentions.0.to_q"),
                "to_k": _linear(sd, f"{src}.attentions.0.to_k"),
                "to_v": _linear(sd, f"{src}.attentions.0.to_v"),
                "to_out": _linear(sd, f"{src}.attentions.0.to_out.0"),
            },
        }

    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    prev_ch = block_out_channels[0]
    for i, ch in enumerate(block_out_channels):
        for j in range(layers_per_block):
            has_sc = f"encoder.down_blocks.{i}.resnets.{j}.conv_shortcut.weight" in sd
            enc[f"down_{i}_resnet_{j}"] = resnet(
                f"encoder.down_blocks.{i}.resnets.{j}", has_sc)
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
        prev_ch = ch
    enc["mid_block"] = mid("encoder.mid_block")
    enc["conv_norm_out"] = _gn("encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block"] = mid("decoder.mid_block")
    n_up = len(block_out_channels)
    for i in range(n_up):
        for j in range(layers_per_block + 1):
            has_sc = f"decoder.up_blocks.{i}.resnets.{j}.conv_shortcut.weight" in sd
            dec[f"up_{i}_resnet_{j}"] = resnet(
                f"decoder.up_blocks.{i}.resnets.{j}", has_sc)
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
    dec["conv_norm_out"] = _gn("decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def load_vae_params(path: str, vae_cfg):
    if path.endswith(".npz"):  # pre-converted (scripts/convert_towers.py)
        from transformer_latent_diffusion_tpu.train.checkpoint import (
            unflatten_npz,
        )

        return unflatten_npz(path)
    sd = load_state_dict_file(path)
    return convert_torch_vae_state_dict(
        sd, vae_cfg.block_out_channels, vae_cfg.layers_per_block)


# ------------------------------ CLIP ---------------------------------------


def convert_torch_clip_state_dict(sd: Dict[str, Any], layers: int) -> Dict[str, Any]:
    """openai CLIP state_dict (text tower only) -> our Flax param tree."""
    sd = _strip_prefix(sd)
    params: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(layers):
        params[f"resblock_{i}"] = _clip_resblock(
            sd, f"transformer.resblocks.{i}")
    return params


def convert_hf_clip_state_dict(sd: Dict[str, Any], layers: int) -> Dict[str, Any]:
    """HuggingFace-transformers CLIPModel/CLIPTextModel state_dict (e.g.
    openai/clip-vit-large-patch14) -> our Flax param tree.

    The HF layout stores q/k/v projections separately
    (text_model.encoder.layers.N.self_attn.{q,k,v}_proj); openai's
    reference layout (and ours) fuses them into one in_proj. Vision-tower
    keys are ignored."""
    sd = _strip_prefix(sd)
    pre = "text_model."
    emb = pre + "embeddings."
    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": _np(sd[emb + "token_embedding.weight"])},
        "positional_embedding": _np(sd[emb + "position_embedding.weight"]),
        "ln_final": _ln(sd, pre + "final_layer_norm"),
        # HF CLIPModel: text_projection.weight is (proj, width), no bias;
        # openai stores the (width, proj) matrix directly
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    for i in range(layers):
        base = f"{pre}encoder.layers.{i}"
        qw = _np(sd[f"{base}.self_attn.q_proj.weight"])
        kw = _np(sd[f"{base}.self_attn.k_proj.weight"])
        vw = _np(sd[f"{base}.self_attn.v_proj.weight"])
        qb = _np(sd[f"{base}.self_attn.q_proj.bias"])
        kb = _np(sd[f"{base}.self_attn.k_proj.bias"])
        vb = _np(sd[f"{base}.self_attn.v_proj.bias"])
        params[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{base}.layer_norm1"),
            "attn_in_proj": {
                "kernel": np.concatenate([qw, kw, vw], axis=0).T,
                "bias": np.concatenate([qb, kb, vb], axis=0),
            },
            "attn_out_proj": _linear(sd, f"{base}.self_attn.out_proj"),
            "ln_2": _ln(sd, f"{base}.layer_norm2"),
            "mlp_c_fc": _linear(sd, f"{base}.mlp.fc1"),
            "mlp_c_proj": _linear(sd, f"{base}.mlp.fc2"),
        }
    return params


def _clip_resblock(sd: Dict[str, Any], base: str) -> Dict[str, Any]:
    """One openai-layout transformer resblock -> flax (shared by the text
    and vision towers — the openai graph uses identical block weights)."""
    return {
        "ln_1": _ln(sd, f"{base}.ln_1"),
        "attn_in_proj": {
            "kernel": _np(sd[f"{base}.attn.in_proj_weight"]).T,
            "bias": _np(sd[f"{base}.attn.in_proj_bias"]),
        },
        "attn_out_proj": _linear(sd, f"{base}.attn.out_proj"),
        "ln_2": _ln(sd, f"{base}.ln_2"),
        "mlp_c_fc": _linear(sd, f"{base}.mlp.c_fc"),
        "mlp_c_proj": _linear(sd, f"{base}.mlp.c_proj"),
    }


def convert_torch_clip_vision_state_dict(sd: Dict[str, Any],
                                         layers: int) -> Dict[str, Any]:
    """openai CLIP state_dict (image tower, `visual.*` keys — or already
    stripped to bare names) -> our ClipVisionModel param tree."""
    sd = _strip_prefix(sd)
    pre = "visual." if any(k.startswith("visual.") for k in sd) else ""
    params: Dict[str, Any] = {
        "class_embedding": _np(sd[pre + "class_embedding"]).reshape(-1),
        "positional_embedding": _np(sd[pre + "positional_embedding"]),
        # torch OIHW conv (no bias) -> flax HWIO
        "conv1": {"kernel":
                  _np(sd[pre + "conv1.weight"]).transpose(2, 3, 1, 0)},
        "ln_pre": _ln(sd, pre + "ln_pre"),
        "ln_post": _ln(sd, pre + "ln_post"),
        # openai stores the (width, embed_dim) matrix directly
        "proj": _np(sd[pre + "proj"]),
    }
    for i in range(layers):
        params[f"resblock_{i}"] = _clip_resblock(
            sd, f"{pre}transformer.resblocks.{i}")
    return params


def convert_hf_clip_vision_state_dict(sd: Dict[str, Any],
                                      layers: int) -> Dict[str, Any]:
    """HuggingFace-transformers CLIPModel/CLIPVisionModel state_dict ->
    our ClipVisionModel param tree.

    Notes: HF's pre-LN key carries the historical typo `pre_layrnorm`;
    q/k/v projections are stored separately and fuse into one in_proj;
    the projection comes from the full CLIPModel's `visual_projection`
    (a bare CLIPVisionModel has none — loading one raises)."""
    sd = _strip_prefix(sd)
    pre = "vision_model."
    emb = pre + "embeddings."
    pre_ln = (pre + "pre_layrnorm" if f"{pre}pre_layrnorm.weight" in sd
              else pre + "pre_layernorm")
    if "visual_projection.weight" not in sd:
        raise KeyError(
            "no visual_projection in checkpoint: convert from the full "
            "CLIPModel (e.g. openai/clip-vit-large-patch14 "
            "model.safetensors), not a bare CLIPVisionModel")
    params: Dict[str, Any] = {
        "class_embedding": _np(sd[emb + "class_embedding"]).reshape(-1),
        "positional_embedding": _np(sd[emb + "position_embedding.weight"]),
        "conv1": {"kernel":
                  _np(sd[emb + "patch_embedding.weight"]).transpose(2, 3, 1, 0)},
        "ln_pre": _ln(sd, pre_ln),
        "ln_post": _ln(sd, pre + "post_layernorm"),
        "proj": _np(sd["visual_projection.weight"]).T,
    }
    for i in range(layers):
        base = f"{pre}encoder.layers.{i}"
        qw = _np(sd[f"{base}.self_attn.q_proj.weight"])
        kw = _np(sd[f"{base}.self_attn.k_proj.weight"])
        vw = _np(sd[f"{base}.self_attn.v_proj.weight"])
        qb = _np(sd[f"{base}.self_attn.q_proj.bias"])
        kb = _np(sd[f"{base}.self_attn.k_proj.bias"])
        vb = _np(sd[f"{base}.self_attn.v_proj.bias"])
        params[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{base}.layer_norm1"),
            "attn_in_proj": {
                "kernel": np.concatenate([qw, kw, vw], axis=0).T,
                "bias": np.concatenate([qb, kb, vb], axis=0),
            },
            "attn_out_proj": _linear(sd, f"{base}.self_attn.out_proj"),
            "ln_2": _ln(sd, f"{base}.layer_norm2"),
            "mlp_c_fc": _linear(sd, f"{base}.mlp.fc1"),
            "mlp_c_proj": _linear(sd, f"{base}.mlp.fc2"),
        }
    return params


def load_clip_vision_params(path: str, layers: int = 24):
    """Load image-tower weights: pre-converted .npz, HF layout, or the
    openai `visual.*` layout (same dispatch shape as load_clip_params)."""
    if path.endswith(".npz"):
        from transformer_latent_diffusion_tpu.train.checkpoint import (
            unflatten_npz,
        )

        return unflatten_npz(path)
    sd = load_state_dict_file(path)
    if any(k.startswith("vision_model.") or ".vision_model." in k for k in sd):
        return convert_hf_clip_vision_state_dict(sd, layers)
    return convert_torch_clip_vision_state_dict(sd, layers)


def load_clip_params(path: str, clip_cfg):
    if path.endswith(".npz"):  # pre-converted (scripts/convert_towers.py)
        from transformer_latent_diffusion_tpu.train.checkpoint import (
            unflatten_npz,
        )

        return unflatten_npz(path)
    sd = load_state_dict_file(path)
    if any(k.startswith("text_model.") or ".text_model." in k for k in sd):
        return convert_hf_clip_state_dict(sd, clip_cfg.layers)
    return convert_torch_clip_state_dict(sd, clip_cfg.layers)
