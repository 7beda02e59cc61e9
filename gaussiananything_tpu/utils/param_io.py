"""Parameter IO: flat-npz export/import and torch-state-dict conversion.

Covers the reference's checkpoint-interop surface (`dist_util.load_state_dict`,
HF checkpoint ingestion `README.md:175-181`): pytrees <-> flat npz for
archival, and a generic torch→flax converter so externally-downloaded
frozen weights (DINOv2 / OpenCLIP, unavailable in this environment) can be
imported into the same-architecture conditioners once provided.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def save_params_npz(path: str, params: Any):
    flat = flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: str, template: Optional[Any] = None) -> Any:
    z = np.load(path)
    flat = {tuple(k.split("/")): z[k] for k in z.files}
    params = unflatten_dict(flat)
    if template is not None:
        # validate shapes against the template pytree
        t_flat = flatten_dict(template, sep="/")
        p_flat = flatten_dict(params, sep="/")
        missing = set(t_flat) - set(p_flat)
        extra = set(p_flat) - set(t_flat)
        if missing or extra:
            raise ValueError(f"param mismatch: missing {sorted(missing)[:5]}"
                             f" extra {sorted(extra)[:5]}")
        for k in t_flat:
            if tuple(t_flat[k].shape) != tuple(p_flat[k].shape):
                raise ValueError(
                    f"shape mismatch at {k}: {p_flat[k].shape} vs "
                    f"{t_flat[k].shape}")
    return jax.tree.map(np.asarray, params)


def import_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                            name_map: Callable[[str], Optional[str]],
                            template: Any,
                            verbatim: Optional[set] = None) -> Any:
    """Convert a torch state dict into a flax param tree.

    `state_dict`: torch name -> numpy array (call `.numpy()` upstream).
    `name_map(torch_name) -> flax 'a/b/c' path or None to skip.
    Linear kernels are transposed (torch stores [out, in]); conv kernels
    are transposed OIHW -> HWIO. Entries missing from the map keep the
    template's values. `verbatim`: flax names copied WITHOUT the 2-D
    transpose heuristic — required for square matrices torch applies as
    ``x @ W`` directly (e.g. CLIP's ``text_projection`` Parameter), where
    shape[::-1] == shape and the heuristic would silently transpose.
    """
    t_flat = flatten_dict(template, sep="/")
    out = dict(t_flat)
    verbatim = verbatim or set()
    for tname, arr in state_dict.items():
        fname = name_map(tname)
        if fname is None:
            continue
        if fname not in t_flat:
            raise KeyError(f"mapped name {fname} not in template")
        tgt = t_flat[fname]
        a = np.asarray(arr)
        if fname in verbatim:
            pass
        elif a.ndim == 2 and a.shape == tgt.shape[::-1]:
            a = a.T                               # torch Linear [out,in]
        elif a.ndim == 4 and a.shape != tgt.shape:
            a = a.transpose(2, 3, 1, 0)           # OIHW -> HWIO
        if tuple(a.shape) != tuple(tgt.shape):
            raise ValueError(f"{tname}->{fname}: shape {a.shape} vs "
                             f"{tgt.shape}")
        out[fname] = a.astype(np.asarray(tgt).dtype)
    return unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})


def dinov2_name_map(torch_name: str) -> Optional[str]:
    """torch-hub ``dinov2_vit*14_reg`` state-dict name → flax path in
    `models/dinov2.Dinov2ViT` (whose submodule names mirror the torch tree;
    reference consumption: `sgm/modules/encoders/modules.py:791-933`).

    Returns None for buffers we do not carry (mask_token — only used for
    iBOT-style masked training, never at inference).
    """
    if torch_name in ("cls_token", "pos_embed", "register_tokens"):
        return torch_name
    if torch_name == "mask_token":
        return None
    if torch_name == "patch_embed.proj.weight":
        return "patch_embed/kernel"
    if torch_name == "patch_embed.proj.bias":
        return "patch_embed/bias"
    if torch_name in ("norm.weight", "norm.bias"):
        return "norm/" + ("scale" if torch_name.endswith("weight") else "bias")
    if torch_name.startswith("blocks."):
        rest = torch_name.split(".", 2)[1:]          # [idx, tail]
        idx, tail = rest[0], rest[1]
        prefix = f"blocks.{idx}/"
        table = {
            "norm1.weight": "norm1/scale", "norm1.bias": "norm1/bias",
            "norm2.weight": "norm2/scale", "norm2.bias": "norm2/bias",
            "attn.qkv.weight": "attn/qkv/kernel",
            "attn.qkv.bias": "attn/qkv/bias",
            "attn.proj.weight": "attn/proj/kernel",
            "attn.proj.bias": "attn/proj/bias",
            "ls1.gamma": "ls1/gamma", "ls2.gamma": "ls2/gamma",
            "mlp.fc1.weight": "mlp.fc1/kernel", "mlp.fc1.bias": "mlp.fc1/bias",
            "mlp.fc2.weight": "mlp.fc2/kernel", "mlp.fc2.bias": "mlp.fc2/bias",
        }
        if tail in table:
            return prefix + table[tail]
    raise KeyError(f"unrecognised dinov2 param {torch_name}")


def as_variables(params: Any) -> Any:
    """Normalise a param tree to the flax variables form `{"params": ...}`.

    `load_params_npz` round-trips whatever was saved — converter outputs
    are already wrapped, raw trees are not — so consumers applying modules
    must normalise instead of blindly wrapping (a double `{"params":
    {"params": ...}}` fails flax's apply with an invalid-structure error).
    """
    if isinstance(params, dict) and set(params) == {"params"}:
        return params
    return {"params": params}


def convert_dinov2(state_dict: Dict[str, "np.ndarray"], template: Any) -> Any:
    """DINOv2 torch-hub checkpoint → `models/dinov2.Dinov2ViT` params.

    Accepts either the bare param tree or the `{"params": ...}` variables
    dict as template; returns the same shape.
    """
    wrapped = isinstance(template, dict) and set(template) == {"params"}
    inner = template["params"] if wrapped else template
    out = import_torch_state_dict(state_dict, dinov2_name_map, inner)
    return {"params": out} if wrapped else out


def openclip_text_name_map(torch_name: str) -> Optional[str]:
    """open_clip CLIP text-tower state dict → flax path in
    `models/openclip_text.OpenClipTextTower` (reference embedder:
    FrozenOpenCLIPEmbedder2, `sgm/modules/encoders/modules.py` t23d yaml).

    Accepts both bare text-tower names (`transformer.resblocks…`) and the
    full-CLIP prefix, skipping the visual tower.
    """
    n = torch_name
    if n.startswith("visual.") or n in ("logit_scale", "logit_bias"):
        return None
    if n.startswith("text."):                        # some open_clip layouts
        n = n[len("text."):]
    if n == "token_embedding.weight":
        return "token_embedding/embedding"
    if n == "positional_embedding":
        return "positional_embedding"
    if n == "text_projection":
        return "text_projection"
    if n in ("ln_final.weight", "ln_final.bias"):
        return "ln_final/" + ("scale" if n.endswith("weight") else "bias")
    if n.startswith("transformer.resblocks."):
        idx, tail = n[len("transformer.resblocks."):].split(".", 1)
        prefix = f"resblocks.{idx}/"
        table = {
            "ln_1.weight": "ln_1/scale", "ln_1.bias": "ln_1/bias",
            "ln_2.weight": "ln_2/scale", "ln_2.bias": "ln_2/bias",
            "attn.in_proj_weight": "attn.in_proj/kernel",
            "attn.in_proj_bias": "attn.in_proj/bias",
            "attn.out_proj.weight": "attn.out_proj/kernel",
            "attn.out_proj.bias": "attn.out_proj/bias",
            "mlp.c_fc.weight": "mlp.c_fc/kernel",
            "mlp.c_fc.bias": "mlp.c_fc/bias",
            "mlp.c_proj.weight": "mlp.c_proj/kernel",
            "mlp.c_proj.bias": "mlp.c_proj/bias",
        }
        if tail in table:
            return prefix + table[tail]
    raise KeyError(f"unrecognised open_clip text param {torch_name}")


def convert_openclip_text(state_dict: Dict[str, "np.ndarray"],
                          template: Any) -> Any:
    """Accepts bare tree or `{"params": ...}` template (see convert_dinov2)."""
    wrapped = isinstance(template, dict) and set(template) == {"params"}
    inner = template["params"] if wrapped else template
    out = import_torch_state_dict(state_dict, openclip_text_name_map, inner,
                                  verbatim={"text_projection"})
    return {"params": out} if wrapped else out


def lpips_vgg_name_map(torch_name: str) -> Optional[str]:
    """pip `lpips` LPIPS(net='vgg') state dict → flax path in
    `train/losses.VGGLPIPS` (reference perceptual loss,
    `nsr/losses/builder.py:530-653`).

    Accepts the lpips layout (`net.sliceS.I.*`, `linK.model.1.weight`) and
    the bare torchvision layout (`features.I.*`, trunk only). The slice
    wrappers keep torchvision's global conv index as the child name, so the
    map ignores the slice number. scaling_layer shift/scale are hardcoded
    constants in the module.
    """
    import re as _re
    n = torch_name
    if n.startswith("scaling_layer."):
        return None
    m = _re.fullmatch(r"(?:net\.slice\d+|features)\.(\d+)\.(weight|bias)", n)
    if m:
        idx, kind = m.group(1), m.group(2)
        return f"net/features.{idx}/" + ("kernel" if kind == "weight"
                                         else "bias")
    m = _re.fullmatch(r"lin(\d)\.model\.1\.weight", n)
    if m:
        return f"lins.{m.group(1)}/kernel"
    raise KeyError(f"unrecognised lpips param {torch_name}")


def convert_lpips_vgg(state_dict: Dict[str, "np.ndarray"],
                      template: Any) -> Any:
    """Accepts either the bare param tree or the `{"params": ...}` variables
    dict (as returned by `losses.init_lpips_template`); returns the same
    wrapping it was given so the result is apply-ready."""
    wrapped = isinstance(template, dict) and set(template) == {"params"}
    inner = template["params"] if wrapped else template
    out = import_torch_state_dict(state_dict, lpips_vgg_name_map, inner)
    return {"params": out} if wrapped else out


def u2net_name_map(torch_name: str) -> Optional[str]:
    """xuebinqin/U-2-Net ``u2net.pth`` / ``u2netp.pth`` state dict → flax
    path in `models/matting.U2Net` (the rembg backbone; reference
    consumption: `utils/infer_utils.py:4,27` via `rembg.remove`).

    Module names mirror the torch tree (stageN[d].rebnconvK[d]); BatchNorm
    running statistics become the `bn_*` params applied at inference.
    """
    n = torch_name
    if n.endswith(".num_batches_tracked"):
        return None
    parts = n.split(".")
    if parts[0] in ("outconv",) or parts[0].startswith("side"):
        kind = {"weight": "kernel", "bias": "bias"}[parts[1]]
        return f"{parts[0]}/{kind}"
    if parts[0].startswith("stage") and len(parts) == 4:
        stage, block, layer, kind = parts
        if layer == "conv_s1":
            return f"{stage}/{block}/conv_s1/" + (
                "kernel" if kind == "weight" else "bias")
        if layer == "bn_s1":
            table = {"weight": "bn_scale", "bias": "bn_bias",
                     "running_mean": "bn_mean", "running_var": "bn_var"}
            return f"{stage}/{block}/{table[kind]}"
    raise KeyError(f"unrecognised u2net param {torch_name}")


def _norm_fused_mlp(sd: Dict[str, "np.ndarray"], prefix: str
                    ) -> Dict[str, "np.ndarray"]:
    """Normalise one MLP's keys under `prefix.` to fc1/fc2 (timm layout).

    Accepts timm (`fc1/fc2`) and xformers FusedMLP layouts. xformers'
    `FusedMLP.mlp` is a Sequential whose Linears may carry their own bias
    (`mlp.{i}.bias`) or delegate it to the following FusedDropoutBias
    (`mlp.{i+1}.bias`); both are matched by shape against the Linear's
    out-features.
    """
    keys = [k for k in sd if k.startswith(prefix + ".")]
    if any(k.endswith("fc1.weight") for k in keys):
        return {k: sd[k] for k in keys}           # already timm layout
    ws = sorted((k for k in keys if sd[k].ndim == 2),
                key=lambda k: int(k.rsplit(".", 2)[-2]))
    bs = [k for k in keys if sd[k].ndim == 1]
    assert len(ws) == 2, f"{prefix}: expected 2 Linear weights, got {ws}"
    out = {}
    for fc, wk in zip(("fc1", "fc2"), ws):
        w = sd[wk]
        out[f"{prefix}.{fc}.weight"] = w
        cand = [bk for bk in bs if sd[bk].shape == (w.shape[0],)]
        # take the positionally-nearest bias (handles square MLPs where
        # both Linears have equal out-features)
        widx = int(wk.rsplit(".", 2)[-2])
        cand.sort(key=lambda bk: abs(int(bk.rsplit(".", 2)[-2]) - widx))
        if cand:
            out[f"{prefix}.{fc}.bias"] = sd[cand[0]]
            bs.remove(cand[0])
    return out


def _split_qkv(w: "np.ndarray", b: Optional["np.ndarray"]):
    """torch packed qkv Linear [3D, D](+[3D]) → three flax (D, D) kernels
    (+ (D,) biases)."""
    q, k, v = np.split(np.asarray(w), 3, axis=0)
    if b is None:
        return (q.T, k.T, v.T), None
    qb, kb, vb = np.split(np.asarray(b), 3, axis=0)
    return (q.T, k.T, v.T), (qb, kb, vb)


def _srt_tx_entries(sd, tprefix: str, fprefix: str, n_layers: int):
    """`nsr/srt/layers.py:146` Transformer (PreNorm MemEffAttention +
    PreNorm FusedMLP) under torch `tprefix.layers.{i}` → flax-layout arrays
    for our `TransformerBlock` named `{fprefix}_{i}` (or `{fprefix}{i}`)."""
    out = {}
    for i in range(n_layers):
        t = f"{tprefix}.layers.{i}"
        f = fprefix.format(i=i)
        out[f"{f}/LayerNorm_0/scale"] = sd[f"{t}.0.norm.weight"]
        out[f"{f}/LayerNorm_0/bias"] = sd[f"{t}.0.norm.bias"]
        (qw, kw, vw), qkvb = _split_qkv(sd[f"{t}.0.fn.qkv.weight"],
                                        sd.get(f"{t}.0.fn.qkv.bias"))
        a = f"{f}/Attention_0"
        out[f"{a}/to_q/kernel"], out[f"{a}/to_k/kernel"], \
            out[f"{a}/to_v/kernel"] = qw, kw, vw
        if qkvb is not None:
            out[f"{a}/to_q/bias"], out[f"{a}/to_k/bias"], \
                out[f"{a}/to_v/bias"] = qkvb
        out[f"{a}/q_norm/scale"] = sd[f"{t}.0.fn.q_norm.weight"]
        out[f"{a}/k_norm/scale"] = sd[f"{t}.0.fn.k_norm.weight"]
        out[f"{a}/to_out/kernel"] = np.asarray(
            sd[f"{t}.0.fn.proj.weight"]).T
        out[f"{a}/to_out/bias"] = sd[f"{t}.0.fn.proj.bias"]
        out[f"{f}/LayerNorm_1/scale"] = sd[f"{t}.1.norm.weight"]
        out[f"{f}/LayerNorm_1/bias"] = sd[f"{t}.1.norm.bias"]
        mlp = _norm_fused_mlp(sd, f"{t}.1.fn")
        out[f"{f}/Mlp_0/Dense_0/kernel"] = np.asarray(
            mlp[f"{t}.1.fn.fc1.weight"]).T
        out[f"{f}/Mlp_0/Dense_0/bias"] = mlp[f"{t}.1.fn.fc1.bias"]
        out[f"{f}/Mlp_0/Dense_1/kernel"] = np.asarray(
            mlp[f"{t}.1.fn.fc2.weight"]).T
        out[f"{f}/Mlp_0/Dense_1/bias"] = mlp[f"{t}.1.fn.fc2.bias"]
    return out


def _timm_mlp_entries(sd, tprefix: str, fprefix: str):
    """timm `Mlp` (fc1/fc2) → our `Mlp` (Dense_0/Dense_1)."""
    return {
        f"{fprefix}/Dense_0/kernel": np.asarray(
            sd[f"{tprefix}.fc1.weight"]).T,
        f"{fprefix}/Dense_0/bias": sd[f"{tprefix}.fc1.bias"],
        f"{fprefix}/Dense_1/kernel": np.asarray(
            sd[f"{tprefix}.fc2.weight"]).T,
        f"{fprefix}/Dense_1/bias": sd[f"{tprefix}.fc2.bias"],
    }


def _resnet_block_entries(sd, tprefix: str, fprefix: str):
    out = {}
    for name in ("norm1", "norm2"):
        out[f"{fprefix}/{name}/GroupNorm_0/scale"] = sd[f"{tprefix}.{name}.weight"]
        out[f"{fprefix}/{name}/GroupNorm_0/bias"] = sd[f"{tprefix}.{name}.bias"]
    for name in ("conv1", "conv2", "nin_shortcut"):
        wk = f"{tprefix}.{name}.weight"
        if wk not in sd:
            continue
        out[f"{fprefix}/{name}/kernel"] = np.asarray(
            sd[wk]).transpose(2, 3, 1, 0)
        out[f"{fprefix}/{name}/bias"] = sd[f"{tprefix}.{name}.bias"]
    return out


def _meca_entries(sd, tprefix: str, fprefix: str, qk_norm: bool):
    """ldm `MemoryEfficientCrossAttention` (bias-less to_q/k/v, to_out.0,
    optional head-dim RMS q/k norms) → our `Attention`."""
    out = {}
    for name in ("to_q", "to_k", "to_v"):
        out[f"{fprefix}/{name}/kernel"] = np.asarray(
            sd[f"{tprefix}.{name}.weight"]).T
    out[f"{fprefix}/to_out/kernel"] = np.asarray(
        sd[f"{tprefix}.to_out.0.weight"]).T
    out[f"{fprefix}/to_out/bias"] = sd[f"{tprefix}.to_out.0.bias"]
    if qk_norm:
        out[f"{fprefix}/q_norm/scale"] = sd[f"{tprefix}.q_norm.weight"]
        out[f"{fprefix}/k_norm/scale"] = sd[f"{tprefix}.k_norm.weight"]
    return out


def convert_gaussiananything_vae(state_dict: Dict[str, "np.ndarray"],
                                 template: Any) -> Any:
    """Official GaussianAnything VAE checkpoint
    (`ckpts/vae/model_rec1965000.pt`, the `AE` module's state dict:
    `encoder.*` = HybridEncoderPCDStructuredLatentSNoPCD, `decoder.*` =
    pcd_structured_latent_space_vae_decoder_cascaded) → params for
    `models/vae.PointVAE` built with `release_parity=True`
    (config preset "vae-release").

    `template`: the `{"params": ...}` variables dict (or bare tree) from
    `PointVAE.init` — depths/widths are read from it, so the converter also
    serves scaled-down test configs.
    """
    wrapped = isinstance(template, dict) and set(template) == {"params"}
    inner = template["params"] if wrapped else template
    t_flat = flatten_dict(inner, sep="/")
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, "np.ndarray"] = {}

    # ---------------------------------------------------------- encoder
    tr = "encoder/sd_trunk"
    out[f"{tr}/conv_in/kernel"] = sd["encoder.conv_in.weight"].transpose(
        2, 3, 1, 0)
    out[f"{tr}/conv_in/bias"] = sd["encoder.conv_in.bias"]
    n_levels = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.down."))
    for i in range(n_levels):
        out.update(_resnet_block_entries(sd, f"encoder.down.{i}.block.0",
                                         f"{tr}/down_{i}_block_0"))
        dk = f"encoder.down.{i}.downsample.conv.weight"
        if dk in sd:
            out[f"{tr}/down_{i}_downsample/conv/kernel"] = \
                sd[dk].transpose(2, 3, 1, 0)
            out[f"{tr}/down_{i}_downsample/conv/bias"] = \
                sd[f"encoder.down.{i}.downsample.conv.bias"]
    out.update(_resnet_block_entries(sd, "encoder.mid.block_1",
                                     f"{tr}/mid_block_1"))
    out.update(_resnet_block_entries(sd, "encoder.mid.block_2",
                                     f"{tr}/mid_block_2"))
    ma, fa = "encoder.mid.attn_1", f"{tr}/mid_attn_1"
    out[f"{fa}/norm/GroupNorm_0/scale"] = sd[f"{ma}.norm.weight"]
    out[f"{fa}/norm/GroupNorm_0/bias"] = sd[f"{ma}.norm.bias"]
    for pj in ("proj_in", "proj_out"):
        out[f"{fa}/{pj}/kernel"] = sd[f"{ma}.{pj}.weight"][:, :, 0, 0].T
        out[f"{fa}/{pj}/bias"] = sd[f"{ma}.{pj}.bias"]
    tb = f"{ma}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        out[f"{fa}/{n}/scale"] = sd[f"{tb}.{n}.weight"]
        out[f"{fa}/{n}/bias"] = sd[f"{tb}.{n}.bias"]
    out.update(_meca_entries(sd, f"{tb}.attn1", f"{fa}/attn1", qk_norm=False))
    out.update(_meca_entries(sd, f"{tb}.attn2", f"{fa}/attn2", qk_norm=False))
    out[f"{fa}/ff/proj/kernel"] = sd[f"{tb}.ff.net.0.proj.weight"].T
    out[f"{fa}/ff/proj/bias"] = sd[f"{tb}.ff.net.0.proj.bias"]
    out[f"{fa}/ff/out/kernel"] = sd[f"{tb}.ff.net.2.weight"].T
    out[f"{fa}/ff/out/bias"] = sd[f"{tb}.ff.net.2.bias"]
    out[f"{tr}/norm_out/GroupNorm_0/scale"] = sd["encoder.norm_out.weight"]
    out[f"{tr}/norm_out/GroupNorm_0/bias"] = sd["encoder.norm_out.bias"]

    n_srt = 1 + max(int(k.split(".")[4]) for k in sd
                    if k.startswith("encoder.srt.transformer.layers."))
    out.update(_srt_tx_entries(sd, "encoder.srt.transformer",
                               "encoder/srt_{i}", n_srt))
    out.update(_meca_entries(sd, "encoder.agg_ca", "encoder/agg_ca",
                             qk_norm=True))
    out["encoder/xyz_pos_embed/Dense_0/kernel"] = \
        sd["encoder.xyz_pos_embed.xyz_projection.weight"].T
    out["encoder/xyz_pos_embed/Dense_0/bias"] = \
        sd["encoder.xyz_pos_embed.xyz_projection.bias"]
    out["encoder/LayerNorm_0/scale"] = sd["encoder.Mlp_out.norm.weight"]
    out["encoder/LayerNorm_0/bias"] = sd["encoder.Mlp_out.norm.bias"]
    out.update(_timm_mlp_entries(sd, "encoder.Mlp_out.fn", "encoder/mlp_out"))

    # ---------------------------------------------------------- decoder
    out["backbone/query_pos_embed"] = sd["decoder.vit_decoder.pos_embed"]
    n_blk = 1 + max(int(k.split(".")[3]) for k in sd
                    if k.startswith("decoder.vit_decoder.blocks."))
    for i in range(n_blk):
        t = f"decoder.vit_decoder.blocks.{i}"
        f = f"backbone/block_{i}"
        (qw, kw, vw), qkvb = _split_qkv(sd[f"{t}.attn.qkv.weight"],
                                        sd.get(f"{t}.attn.qkv.bias"))
        a = f"{f}/Attention_0"
        out[f"{a}/to_q/kernel"], out[f"{a}/to_k/kernel"], \
            out[f"{a}/to_v/kernel"] = qw, kw, vw
        if qkvb is not None:
            out[f"{a}/to_q/bias"], out[f"{a}/to_k/bias"], \
                out[f"{a}/to_v/bias"] = qkvb
        out[f"{a}/q_norm/scale"] = sd[f"{t}.attn.q_norm.weight"]
        out[f"{a}/k_norm/scale"] = sd[f"{t}.attn.k_norm.weight"]
        out[f"{a}/to_out/kernel"] = sd[f"{t}.attn.proj.weight"].T
        out[f"{a}/to_out/bias"] = sd[f"{t}.attn.proj.bias"]
        mlp = _norm_fused_mlp(sd, f"{t}.mlp")
        out[f"{f}/Mlp_0/Dense_0/kernel"] = np.asarray(
            mlp[f"{t}.mlp.fc1.weight"]).T
        out[f"{f}/Mlp_0/Dense_0/bias"] = mlp[f"{t}.mlp.fc1.bias"]
        out[f"{f}/Mlp_0/Dense_1/kernel"] = np.asarray(
            mlp[f"{t}.mlp.fc2.weight"]).T
        out[f"{f}/Mlp_0/Dense_1/bias"] = mlp[f"{t}.mlp.fc2.bias"]
        out[f"{f}/adaLN/kernel"] = sd[f"{t}.adaLN_modulation.1.weight"].T
        out[f"{f}/adaLN/bias"] = sd[f"{t}.adaLN_modulation.1.bias"]

    sr = "decoder.superresolution"
    out.update(_timm_mlp_entries(sd, f"{sr}.quant_conv", "quant_mlp"))
    out.update(_timm_mlp_entries(sd, f"{sr}.post_quant_conv",
                                 "post_quant_mlp"))
    out["base_head/Dense_0/kernel"] = \
        sd[f"{sr}.conv_sr.gaussian_pred.1.weight"].T
    out["base_head/Dense_0/bias"] = sd[f"{sr}.conv_sr.gaussian_pred.1.bias"]
    for k, tname in enumerate(("ada_CA_f4_1", "ada_CA_f4_2", "ada_CA_f4_3")):
        t = f"{sr}.{tname}"
        if f"{t}.latent_embedding" not in sd:
            break
        f = f"upsamplers_{k}"
        out[f"{f}/latent_embedding"] = np.asarray(
            sd[f"{t}.latent_embedding"])[None]       # (1,f,D) -> (1,1,f,D)
        lp = f"{t}.transformer.layers."
        depth = 1 + max(int(key[len(lp):].split(".")[0]) for key in sd
                        if key.startswith(lp))
        out.update(_srt_tx_entries(sd, f"{t}.transformer",
                                   f + "/tx_{i}", depth))
        out[f"{f}/LayerNorm_0/scale"] = \
            sd[f"{t}.gaussian_residual_pred.norm.weight"]
        out[f"{f}/LayerNorm_0/bias"] = \
            sd[f"{t}.gaussian_residual_pred.norm.bias"]
        out[f"{f}/res_head/kernel"] = \
            sd[f"{t}.gaussian_residual_pred.fn.weight"].T
        out[f"{f}/res_head/bias"] = sd[f"{t}.gaussian_residual_pred.fn.bias"]

    # validate against the template and fill
    merged = dict(t_flat)
    for k, v in out.items():
        if k not in t_flat:
            raise KeyError(f"converted name {k} not in template")
        tgt = np.asarray(t_flat[k])
        v = np.asarray(v)
        if tuple(v.shape) != tuple(tgt.shape):
            raise ValueError(f"{k}: shape {v.shape} vs {tgt.shape}")
        merged[k] = v.astype(tgt.dtype)
    missing = set(t_flat) - set(out)
    if missing:
        raise ValueError(
            f"checkpoint did not cover {len(missing)} template params, "
            f"e.g. {sorted(missing)[:5]} — wrong config for this checkpoint?")
    res = unflatten_dict({tuple(k.split("/")): v for k, v in merged.items()})
    return {"params": res} if wrapped else res


def convert_gaussiananything_dit(state_dict: Dict[str, "np.ndarray"],
                                 template: Any) -> Any:
    """Official GaussianAnything flow-matching DiT checkpoint
    (`checkpoints/i23d/stage-1|stage-2/model_*.pt`:
    `DiT_I23D_PCD_PixelArt_noclip[_clay_stage2]`, `dit/dit_i23d.py:437,664`,
    built by `DiT_L_Pixelart_clay_pcd[_stage2]`, `:1516-1554`) → params for
    `models/dit.PointDiT` with `release_parity=True`
    (`stage1_dit_release` / `stage2_dit_release`).

    Runtime-unused reference params (cap_embedder, attention_y_norm,
    clip_spatial_proj) are ignored.
    """
    wrapped = isinstance(template, dict) and set(template) == {"params"}
    inner = template["params"] if wrapped else template
    t_flat = flatten_dict(inner, sep="/")
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, "np.ndarray"] = {}

    # i23d CLAY layout vs t23d text layout (`dit/dit_trilatent.py:262`):
    # detected from the block params; the pooled-vector embedder is
    # `pooled_vec_embedder` (i23d) / `cap_embedder` (t23d)
    text_variant = "blocks.0.prenorm_ca_text.weight" in sd
    vec_prefix = "cap_embedder" if text_variant else "pooled_vec_embedder"

    out.update(_timm_mlp_entries(sd, "x_embedder", "x_embedder"))
    for i, j in ((0, 0), (2, 1)):
        out[f"t_embedder/Dense_{j}/kernel"] = np.asarray(
            sd[f"t_embedder.mlp.{i}.weight"]).T
        out[f"t_embedder/Dense_{j}/bias"] = sd[f"t_embedder.mlp.{i}.bias"]
    out["pooled_vec_ln/scale"] = sd[f"{vec_prefix}.0.weight"]
    out["pooled_vec_ln/bias"] = sd[f"{vec_prefix}.0.bias"]
    out["vector_proj/kernel"] = np.asarray(
        sd[f"{vec_prefix}.1.weight"]).T
    out["vector_proj/bias"] = sd[f"{vec_prefix}.1.bias"]
    out["shared_adaln/kernel"] = np.asarray(
        sd["adaLN_modulation.1.weight"]).T
    out["shared_adaln/bias"] = sd["adaLN_modulation.1.bias"]
    if "xyz_pos_embed.xyz_projection.weight" in sd:      # stage-2
        out["xyz_pe/Dense_0/kernel"] = np.asarray(
            sd["xyz_pos_embed.xyz_projection.weight"]).T
        out["xyz_pe/Dense_0/bias"] = sd["xyz_pos_embed.xyz_projection.bias"]

    n_blk = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("blocks."))
    for i in range(n_blk):
        t = f"blocks.{i}"
        f = f"block_{i}"
        out[f"{f}/scale_shift_table"] = sd[f"{t}.scale_shift_table"]
        out[f"{f}/norm1/scale"] = sd[f"{t}.norm1.weight"]
        out[f"{f}/norm2/scale"] = sd[f"{t}.norm2.weight"]
        if text_variant:
            out[f"{f}/prenorm_ca/scale"] = sd[f"{t}.prenorm_ca_text.weight"]
            out[f"{f}/attention_y_norm/scale"] = \
                sd[f"{t}.attention_y_norm.weight"]
            out.update(_meca_entries(sd, f"{t}.cross_attn",
                                     f"{f}/cross_attn", qk_norm=True))
        else:
            out[f"{f}/prenorm_ca/scale"] = sd[f"{t}.prenorm_ca_dino.weight"]
            out.update(_meca_entries(sd, f"{t}.cross_attn_dino",
                                     f"{f}/cross_attn", qk_norm=True))
        (qw, kw, vw), qkvb = _split_qkv(sd[f"{t}.attn.qkv.weight"],
                                        sd.get(f"{t}.attn.qkv.bias"))
        a = f"{f}/self_attn"
        out[f"{a}/to_q/kernel"], out[f"{a}/to_k/kernel"], \
            out[f"{a}/to_v/kernel"] = qw, kw, vw
        if qkvb is not None:
            out[f"{a}/to_q/bias"], out[f"{a}/to_k/bias"], \
                out[f"{a}/to_v/bias"] = qkvb
        out[f"{a}/q_norm/scale"] = sd[f"{t}.attn.q_norm.weight"]
        out[f"{a}/k_norm/scale"] = sd[f"{t}.attn.k_norm.weight"]
        out[f"{a}/to_out/kernel"] = np.asarray(sd[f"{t}.attn.proj.weight"]).T
        out[f"{a}/to_out/bias"] = sd[f"{t}.attn.proj.bias"]
        mlp = _norm_fused_mlp(sd, f"{t}.mlp")
        out[f"{f}/Mlp_0/Dense_0/kernel"] = np.asarray(
            mlp[f"{t}.mlp.fc1.weight"]).T
        out[f"{f}/Mlp_0/Dense_0/bias"] = mlp[f"{t}.mlp.fc1.bias"]
        out[f"{f}/Mlp_0/Dense_1/kernel"] = np.asarray(
            mlp[f"{t}.mlp.fc2.weight"]).T
        out[f"{f}/Mlp_0/Dense_1/bias"] = mlp[f"{t}.mlp.fc2.bias"]

    out["final_scale_shift"] = sd["final_layer.scale_shift_table"]
    out["final_proj/kernel"] = np.asarray(sd["final_layer.linear.weight"]).T
    out["final_proj/bias"] = sd["final_layer.linear.bias"]

    merged = dict(t_flat)
    for k, v in out.items():
        if k not in t_flat:
            raise KeyError(f"converted name {k} not in template")
        tgt = np.asarray(t_flat[k])
        v = np.asarray(v)
        if tuple(v.shape) != tuple(tgt.shape):
            raise ValueError(f"{k}: shape {v.shape} vs {tgt.shape}")
        merged[k] = v.astype(tgt.dtype)
    missing = set(t_flat) - set(out)
    if missing:
        raise ValueError(
            f"checkpoint did not cover {len(missing)} template params, "
            f"e.g. {sorted(missing)[:5]} — wrong config for this checkpoint?")
    res = unflatten_dict({tuple(k.split("/")): v for k, v in merged.items()})
    return {"params": res} if wrapped else res


def convert_u2net(state_dict: Dict[str, "np.ndarray"], template: Any) -> Any:
    """u2net(.pth) → `models/matting.U2Net` params. Accepts the bare param
    tree or the `{"params": ...}` variables dict; returns the same
    wrapping."""
    wrapped = isinstance(template, dict) and set(template) == {"params"}
    inner = template["params"] if wrapped else template
    out = import_torch_state_dict(state_dict, u2net_name_map, inner)
    return {"params": out} if wrapped else out
