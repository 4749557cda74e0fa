"""PyTorch -> Flax weight import.

Replaces the reference's pretrained-weight plumbing:
  * SD VAE  (reference train_stage_1_referencenet.py:124-127)
  * SD UNet 2D -> 3D inflation with strict=False missing-temporal-params
    semantics (reference magicanimate/models/unet_controlnet.py:486-525)
  * wav2vec2-base (reference Net.py:620-626)

Name mapping uses diffusers / transformers state-dict conventions so real
SD-1.5 / wav2vec2 checkpoints load directly. Conv kernels transpose
OIHW -> HWIO, linear weights transpose [O,I] -> [I,O]. Temporal / audio /
speed / face modules have no source weights and keep their (identity-at-init)
initialisation — that IS the 2D->3D inflation: spatial weights are shared
across frames because frames fold into the batch (emox.nn.blocks.fold_time),
so no kernel replication is needed at all.

Faithful import requires the matching config flags:
  ModelConfig(attention_heads=8, resnet_temb_mode="add") for SD-1.5.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from emox.core.config import AudioConfig, ModelConfig, VAEConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_state_dict(path: str) -> StateDict:
    """Load a .pt/.pth/.safetensors file into numpy arrays (no torch needed
    for safetensors)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # type: ignore

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def _conv(w: Array) -> Array:
    """OIHW -> HWIO (or OIW -> WIO for 1D)."""
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 3:
        return np.transpose(w, (2, 1, 0))
    raise ValueError(f"not a conv kernel: shape {w.shape}")


def _dense(w: Array) -> Array:
    return np.transpose(w, (1, 0))


def _conv1x1_dense(w: Array) -> Array:
    """1x1 conv OI11 -> dense [I, O] (SD<0.11 proj_in/out were convs)."""
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


@dataclass
class InflationReport:
    """What loaded and what stayed at init (the reference logs its temporal
    param count the same way, unet_controlnet.py:516-523)."""

    loaded: List[str] = field(default_factory=list)
    missing_in_source: List[str] = field(default_factory=list)
    unused_source_keys: List[str] = field(default_factory=list)

    def summary(self) -> str:
        return (
            f"loaded {len(self.loaded)} tensors; "
            f"{len(self.missing_in_source)} target params kept at init "
            f"(temporal/audio/speed/face); {len(self.unused_source_keys)} source keys unused"
        )


class _Mapper:
    def __init__(self, sd: StateDict):
        self.sd = sd
        self.report = InflationReport()
        self.used: set = set()

    def take(self, key: str, transform=None) -> Optional[Array]:
        if key not in self.sd:
            return None
        self.used.add(key)
        v = np.asarray(self.sd[key]).astype(np.float32)
        return transform(v) if transform else v

    def put(self, tree: Dict[str, Any], path: str, key: str, transform=None) -> None:
        v = self.take(key, transform)
        if v is None:
            self.report.missing_in_source.append(path)
            return
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
        self.report.loaded.append(path)

    def finish(self) -> None:
        self.report.unused_source_keys = sorted(set(self.sd) - self.used)


def _map_resblock(m: _Mapper, tree: Dict, dst: str, src: str, has_temb: bool) -> None:
    m.put(tree, f"{dst}/norm1/scale", f"{src}.norm1.weight")
    m.put(tree, f"{dst}/norm1/bias", f"{src}.norm1.bias")
    m.put(tree, f"{dst}/conv1/kernel", f"{src}.conv1.weight", _conv)
    m.put(tree, f"{dst}/conv1/bias", f"{src}.conv1.bias")
    if has_temb:
        m.put(tree, f"{dst}/time_proj/kernel", f"{src}.time_emb_proj.weight", _dense)
        m.put(tree, f"{dst}/time_proj/bias", f"{src}.time_emb_proj.bias")
    m.put(tree, f"{dst}/norm2/scale", f"{src}.norm2.weight")
    m.put(tree, f"{dst}/norm2/bias", f"{src}.norm2.bias")
    m.put(tree, f"{dst}/conv2/kernel", f"{src}.conv2.weight", _conv)
    m.put(tree, f"{dst}/conv2/bias", f"{src}.conv2.bias")
    if f"{src}.conv_shortcut.weight" in m.sd:
        m.put(tree, f"{dst}/skip/kernel", f"{src}.conv_shortcut.weight", _conv)
        m.put(tree, f"{dst}/skip/bias", f"{src}.conv_shortcut.bias")


def _map_vae_attn(m: _Mapper, tree: Dict, dst: str, src: str) -> None:
    # newer diffusers: to_q/to_k/to_v/to_out.0 ; older: query/key/value/proj_attn
    newer = f"{src}.to_q.weight" in m.sd
    q, k, v, o = ("to_q", "to_k", "to_v", "to_out.0") if newer else ("query", "key", "value", "proj_attn")
    m.put(tree, f"{dst}/norm/scale", f"{src}.group_norm.weight")
    m.put(tree, f"{dst}/norm/bias", f"{src}.group_norm.bias")
    for name, s in (("to_q", q), ("to_k", k), ("to_v", v), ("to_out", o)):
        m.put(tree, f"{dst}/attn/{name}/kernel", f"{src}.{s}.weight", _dense)
        m.put(tree, f"{dst}/attn/{name}/bias", f"{src}.{s}.bias")


def import_vae(sd: StateDict, cfg: VAEConfig) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> emox AutoencoderKL params."""
    m = _Mapper(sd)
    tree: Dict[str, Any] = {}
    n_levels = len(cfg.channel_multipliers)
    for side in ("encoder", "decoder"):
        m.put(tree, f"{side}/conv_in/kernel", f"{side}.conv_in.weight", _conv)
        m.put(tree, f"{side}/conv_in/bias", f"{side}.conv_in.bias")
        for i in range(2):
            _map_resblock(m, tree, f"{side}/mid_res_{i}", f"{side}.mid_block.resnets.{i}", False)
        _map_vae_attn(m, tree, f"{side}/mid_attn", f"{side}.mid_block.attentions.0")
        m.put(tree, f"{side}/norm_out/scale", f"{side}.conv_norm_out.weight")
        m.put(tree, f"{side}/norm_out/bias", f"{side}.conv_norm_out.bias")
        m.put(tree, f"{side}/conv_out/kernel", f"{side}.conv_out.weight", _conv)
        m.put(tree, f"{side}/conv_out/bias", f"{side}.conv_out.bias")
    for lvl in range(n_levels):
        for i in range(cfg.num_res_blocks):
            _map_resblock(m, tree, f"encoder/down_{lvl}_res_{i}", f"encoder.down_blocks.{lvl}.resnets.{i}", False)
        if lvl < n_levels - 1:
            m.put(tree, f"encoder/down_{lvl}_ds/Conv_0/kernel", f"encoder.down_blocks.{lvl}.downsamplers.0.conv.weight", _conv)
            m.put(tree, f"encoder/down_{lvl}_ds/Conv_0/bias", f"encoder.down_blocks.{lvl}.downsamplers.0.conv.bias")
    # decoder up_blocks.{k}: k=0 is deepest -> our up_{n_levels-1-k}
    for k in range(n_levels):
        lvl = n_levels - 1 - k
        for i in range(cfg.num_res_blocks + 1):
            _map_resblock(m, tree, f"decoder/up_{lvl}_res_{i}", f"decoder.up_blocks.{k}.resnets.{i}", False)
        if lvl > 0:
            m.put(tree, f"decoder/up_{lvl}_us/Conv_0/kernel", f"decoder.up_blocks.{k}.upsamplers.0.conv.weight", _conv)
            m.put(tree, f"decoder/up_{lvl}_us/Conv_0/bias", f"decoder.up_blocks.{k}.upsamplers.0.conv.bias")
    m.put(tree, "quant_conv/kernel", "quant_conv.weight", _conv)
    m.put(tree, "quant_conv/bias", "quant_conv.bias")
    m.put(tree, "post_quant_conv/kernel", "post_quant_conv.weight", _conv)
    m.put(tree, "post_quant_conv/bias", "post_quant_conv.bias")
    m.finish()
    tree["__report__"] = m.report
    return tree


def _map_transformer_block(m: _Mapper, tree: Dict, dst: str, src: str) -> None:
    for norm in ("norm1", "norm2", "norm3"):
        m.put(tree, f"{dst}/{norm}/scale", f"{src}.{norm}.weight")
        m.put(tree, f"{dst}/{norm}/bias", f"{src}.{norm}.bias")
    for attn in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v"):
            m.put(tree, f"{dst}/{attn}/{proj}/kernel", f"{src}.{attn}.{proj}.weight", _dense)
        m.put(tree, f"{dst}/{attn}/to_out/kernel", f"{src}.{attn}.to_out.0.weight", _dense)
        m.put(tree, f"{dst}/{attn}/to_out/bias", f"{src}.{attn}.to_out.0.bias")
    m.put(tree, f"{dst}/ff/proj_in/kernel", f"{src}.ff.net.0.proj.weight", _dense)
    m.put(tree, f"{dst}/ff/proj_in/bias", f"{src}.ff.net.0.proj.bias")
    m.put(tree, f"{dst}/ff/proj_out/kernel", f"{src}.ff.net.2.weight", _dense)
    m.put(tree, f"{dst}/ff/proj_out/bias", f"{src}.ff.net.2.bias")


def _map_spatial_transformer(m: _Mapper, tree: Dict, dst: str, src: str, depth: int = 1) -> None:
    m.put(tree, f"{dst}/norm/scale", f"{src}.norm.weight")
    m.put(tree, f"{dst}/norm/bias", f"{src}.norm.bias")
    proj_t = _conv1x1_dense if m.sd.get(f"{src}.proj_in.weight", np.zeros(0)).ndim == 4 else _dense
    m.put(tree, f"{dst}/proj_in/kernel", f"{src}.proj_in.weight", proj_t)
    m.put(tree, f"{dst}/proj_in/bias", f"{src}.proj_in.bias")
    for d in range(depth):
        _map_transformer_block(m, tree, f"{dst}/block_{d}", f"{src}.transformer_blocks.{d}")
    m.put(tree, f"{dst}/proj_out/kernel", f"{src}.proj_out.weight", proj_t)
    m.put(tree, f"{dst}/proj_out/bias", f"{src}.proj_out.bias")


def import_unet2d(sd: StateDict, cfg: ModelConfig) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state dict -> emox UNet params.

    Works for both the ReferenceNet (2D config) and the denoiser: the
    denoiser's temporal/audio/speed/face params are reported as
    missing_in_source and keep their identity init — the strict=False
    inflation semantics of the reference (unet_controlnet.py:516-523).
    """
    m = _Mapper(sd)
    tree: Dict[str, Any] = {}
    n_levels = len(cfg.channel_multipliers)
    m.put(tree, "conv_in/kernel", "conv_in.weight", _conv)
    m.put(tree, "conv_in/bias", "conv_in.bias")
    m.put(tree, "time_embed/fc1/kernel", "time_embedding.linear_1.weight", _dense)
    m.put(tree, "time_embed/fc1/bias", "time_embedding.linear_1.bias")
    m.put(tree, "time_embed/fc2/kernel", "time_embedding.linear_2.weight", _dense)
    m.put(tree, "time_embed/fc2/bias", "time_embedding.linear_2.bias")
    for lvl in range(n_levels):
        for i in range(cfg.layers_per_block):
            _map_resblock(m, tree, f"down_{lvl}_res_{i}", f"down_blocks.{lvl}.resnets.{i}", True)
            if lvl in cfg.attention_levels:
                _map_spatial_transformer(m, tree, f"down_{lvl}_{i}_attn", f"down_blocks.{lvl}.attentions.{i}")
        if lvl < n_levels - 1:
            m.put(tree, f"down_{lvl}_ds/Conv_0/kernel", f"down_blocks.{lvl}.downsamplers.0.conv.weight", _conv)
            m.put(tree, f"down_{lvl}_ds/Conv_0/bias", f"down_blocks.{lvl}.downsamplers.0.conv.bias")
    _map_resblock(m, tree, "mid_res_0", "mid_block.resnets.0", True)
    _map_spatial_transformer(m, tree, "mid_attn", "mid_block.attentions.0")
    _map_resblock(m, tree, "mid_res_1", "mid_block.resnets.1", True)
    # up_blocks.{k}: k=0 deepest -> our up_{n_levels-1-k}
    for k in range(n_levels):
        lvl = n_levels - 1 - k
        for i in range(cfg.layers_per_block + 1):
            _map_resblock(m, tree, f"up_{lvl}_res_{i}", f"up_blocks.{k}.resnets.{i}", True)
            if lvl in cfg.attention_levels:
                _map_spatial_transformer(m, tree, f"up_{lvl}_{i}_attn", f"up_blocks.{k}.attentions.{i}")
        if lvl > 0:
            m.put(tree, f"up_{lvl}_us/Conv_0/kernel", f"up_blocks.{k}.upsamplers.0.conv.weight", _conv)
            m.put(tree, f"up_{lvl}_us/Conv_0/bias", f"up_blocks.{k}.upsamplers.0.conv.bias")
    m.put(tree, "norm_out/scale", "conv_norm_out.weight")
    m.put(tree, "norm_out/bias", "conv_norm_out.bias")
    m.put(tree, "conv_out/kernel", "conv_out.weight", _conv)
    m.put(tree, "conv_out/bias", "conv_out.bias")
    m.finish()
    tree["__report__"] = m.report
    return tree


def import_wav2vec2(sd: StateDict, cfg: AudioConfig) -> Dict[str, Any]:
    """transformers Wav2Vec2Model state dict -> emox AudioEncoder params."""
    m = _Mapper(sd)
    tree: Dict[str, Any] = {}
    pre = "wav2vec2." if any(k.startswith("wav2vec2.") for k in sd) else ""
    for i in range(len(cfg.conv_kernels)):
        m.put(tree, f"feature_extractor/conv{i}/kernel", f"{pre}feature_extractor.conv_layers.{i}.conv.weight", _conv)
        if i == 0:
            m.put(tree, "feature_extractor/gn0/scale", f"{pre}feature_extractor.conv_layers.0.layer_norm.weight")
            m.put(tree, "feature_extractor/gn0/bias", f"{pre}feature_extractor.conv_layers.0.layer_norm.bias")
    m.put(tree, "feat_norm/scale", f"{pre}feature_projection.layer_norm.weight")
    m.put(tree, "feat_norm/bias", f"{pre}feature_projection.layer_norm.bias")
    m.put(tree, "feat_proj/kernel", f"{pre}feature_projection.projection.weight", _dense)
    m.put(tree, "feat_proj/bias", f"{pre}feature_projection.projection.bias")
    # weight-normed positional conv (torch weight_norm dim=2 on [O, I/g, K]:
    # per-K-slice norm over dims (0, 1)): w = g * v / ||v||
    g = m.take(f"{pre}encoder.pos_conv_embed.conv.weight_g")
    v = m.take(f"{pre}encoder.pos_conv_embed.conv.weight_v")
    if g is None:  # torch >= 2.1 parametrized naming
        g = m.take(f"{pre}encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        v = m.take(f"{pre}encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    if g is not None and v is not None:
        w = g * v / np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
        tree.setdefault("pos_conv", {})["kernel"] = _conv(w)
        m.report.loaded.append("pos_conv/kernel")
    m.put(tree, "pos_conv/bias", f"{pre}encoder.pos_conv_embed.conv.bias")
    m.put(tree, "enc_norm/scale", f"{pre}encoder.layer_norm.weight")
    m.put(tree, "enc_norm/bias", f"{pre}encoder.layer_norm.bias")
    for i in range(cfg.num_layers):
        s = f"{pre}encoder.layers.{i}"
        d = f"layer_{i}"
        for proj, name in (("q_proj", "to_q"), ("k_proj", "to_k"), ("v_proj", "to_v"), ("out_proj", "to_out")):
            m.put(tree, f"{d}/attn/{name}/kernel", f"{s}.attention.{proj}.weight", _dense)
            m.put(tree, f"{d}/attn/{name}/bias", f"{s}.attention.{proj}.bias")
        m.put(tree, f"{d}/norm1/scale", f"{s}.layer_norm.weight")
        m.put(tree, f"{d}/norm1/bias", f"{s}.layer_norm.bias")
        m.put(tree, f"{d}/ff1/kernel", f"{s}.feed_forward.intermediate_dense.weight", _dense)
        m.put(tree, f"{d}/ff1/bias", f"{s}.feed_forward.intermediate_dense.bias")
        m.put(tree, f"{d}/ff2/kernel", f"{s}.feed_forward.output_dense.weight", _dense)
        m.put(tree, f"{d}/ff2/bias", f"{s}.feed_forward.output_dense.bias")
        m.put(tree, f"{d}/norm2/scale", f"{s}.final_layer_norm.weight")
        m.put(tree, f"{d}/norm2/bias", f"{s}.final_layer_norm.bias")
    m.finish()
    tree["__report__"] = m.report
    return tree


def _map_clip_layer(m: _Mapper, tree: Dict, dst: str, src: str) -> None:
    m.put(tree, f"{dst}/norm1/scale", f"{src}.layer_norm1.weight")
    m.put(tree, f"{dst}/norm1/bias", f"{src}.layer_norm1.bias")
    for proj, name in (("q_proj", "to_q"), ("k_proj", "to_k"), ("v_proj", "to_v"), ("out_proj", "to_out")):
        m.put(tree, f"{dst}/attn/{name}/kernel", f"{src}.self_attn.{proj}.weight", _dense)
        m.put(tree, f"{dst}/attn/{name}/bias", f"{src}.self_attn.{proj}.bias")
    m.put(tree, f"{dst}/norm2/scale", f"{src}.layer_norm2.weight")
    m.put(tree, f"{dst}/norm2/bias", f"{src}.layer_norm2.bias")
    m.put(tree, f"{dst}/fc1/kernel", f"{src}.mlp.fc1.weight", _dense)
    m.put(tree, f"{dst}/fc1/bias", f"{src}.mlp.fc1.bias")
    m.put(tree, f"{dst}/fc2/kernel", f"{src}.mlp.fc2.weight", _dense)
    m.put(tree, f"{dst}/fc2/bias", f"{src}.mlp.fc2.bias")


def import_clip_text(sd: StateDict, cfg) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> emox CLIPTextEncoder params
    (the prompt encoder SD-1.5 ships, reference
    magicanimate/pipelines/animation.py:76)."""
    m = _Mapper(sd)
    tree: Dict[str, Any] = {}
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    m.put(tree, "token_embedding/embedding", f"{pre}embeddings.token_embedding.weight")
    m.put(tree, "position_embedding", f"{pre}embeddings.position_embedding.weight")
    for i in range(cfg.text_layers):
        _map_clip_layer(m, tree, f"layer_{i}", f"{pre}encoder.layers.{i}")
    m.put(tree, "final_norm/scale", f"{pre}final_layer_norm.weight")
    m.put(tree, "final_norm/bias", f"{pre}final_layer_norm.bias")
    # ignore buffers like position_ids
    m.used.update(k for k in sd if k.endswith("position_ids"))
    m.finish()
    tree["__report__"] = m.report
    return tree


def import_clip_vision(sd: StateDict, cfg) -> Dict[str, Any]:
    """transformers CLIPVisionModelWithProjection state dict -> emox
    CLIPVisionEncoder params (the EMO image/identity encoder, reference
    EMOAnimationPipeline.py:867)."""
    m = _Mapper(sd)
    tree: Dict[str, Any] = {}
    pre = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    m.put(tree, "class_embedding", f"{pre}embeddings.class_embedding")
    m.put(tree, "patch_embedding/kernel", f"{pre}embeddings.patch_embedding.weight", _conv)
    m.put(tree, "position_embedding", f"{pre}embeddings.position_embedding.weight")
    # transformers spells it "pre_layrnorm" (upstream typo kept for parity)
    pre_ln = "pre_layrnorm" if f"{pre}pre_layrnorm.weight" in sd else "pre_layernorm"
    m.put(tree, "pre_norm/scale", f"{pre}{pre_ln}.weight")
    m.put(tree, "pre_norm/bias", f"{pre}{pre_ln}.bias")
    for i in range(cfg.vision_layers):
        _map_clip_layer(m, tree, f"layer_{i}", f"{pre}encoder.layers.{i}")
    m.put(tree, "post_norm/scale", f"{pre}post_layernorm.weight")
    m.put(tree, "post_norm/bias", f"{pre}post_layernorm.bias")
    m.put(tree, "visual_projection/kernel", "visual_projection.weight", _dense)
    m.used.update(k for k in sd if k.endswith("position_ids"))
    m.finish()
    tree["__report__"] = m.report
    return tree


def merge_imported(target_params: Dict[str, Any], imported: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay imported tensors onto an init param tree (shape-checked);
    params absent from the import keep their init values."""
    import jax

    imported = {k: v for k, v in imported.items() if k != "__report__"}

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"imported key {path}/{k} not in target params")
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(f"shape mismatch at {path}/{k}: {dst[k].shape} vs {v.shape}")
                out[k] = v.astype(np.asarray(dst[k]).dtype)
        return out

    return overlay(target_params, imported)
