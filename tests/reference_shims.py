"""Import shims that let the ACTUAL reference modules run on CPU torch.

The reference (`/root/reference`) depends on CUDA-era packages absent from
this image. Two shims are NUMERICALLY FAITHFUL because the golden tests
flow activations through them:

  * `timm.models.vision_transformer.PatchEmbed / Mlp` — standard timm
    semantics (conv patchify + flatten; fc1/act/fc2), parameter names
    matching timm so reference state dicts load.
  * `xformers.ops.memory_efficient_attention` — exact softmax attention
    over xformers' (B, M, C) / (B, M, H, K) layouts, fp32 accumulation
    (the CUDA kernel's effective behaviour), default scale K^-0.5.

Everything else (kornia, point_cloud_utils, pytorch3d, blobfile,
torchvision, torchdiffeq, mpi4py) is an import-satisfying stub: the golden
tests never execute those code paths; touching a stub raises.

Usage: `import reference_shims; reference_shims.install()` BEFORE adding
/root/reference to sys.path and importing its modules.
"""
from __future__ import annotations

import importlib.machinery
import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# faithful pieces
# ---------------------------------------------------------------------------

def _to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class Mlp(nn.Module):
    """timm.layers.mlp.Mlp (the subset the reference constructs)."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0,
                 use_conv=False):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        b1, b2 = _to_2tuple(bias)
        d1, d2 = _to_2tuple(drop)
        assert not use_conv
        self.fc1 = nn.Linear(in_features, hidden_features, bias=b1)
        self.act = act_layer()
        self.drop1 = nn.Dropout(d1)
        self.norm = (norm_layer(hidden_features) if norm_layer is not None
                     else nn.Identity())
        self.fc2 = nn.Linear(hidden_features, out_features, bias=b2)
        self.drop2 = nn.Dropout(d2)

    def forward(self, x):
        return self.drop2(self.fc2(self.norm(self.drop1(self.act(
            self.fc1(x))))))


class PatchEmbed(nn.Module):
    """timm.layers.patch_embed.PatchEmbed (flatten=True subset)."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 embed_dim=768, norm_layer=None, flatten=True, bias=True,
                 **_ignore):
        super().__init__()
        img_size = _to_2tuple(img_size)
        patch_size = _to_2tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.grid_size = (img_size[0] // patch_size[0],
                          img_size[1] // patch_size[1])
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.flatten = flatten
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size, bias=bias)
        self.norm = (norm_layer(embed_dim) if norm_layer is not None
                     else nn.Identity())

    def forward(self, x):
        x = self.proj(x)
        if self.flatten:
            x = x.flatten(2).transpose(1, 2)        # (B, N, C)
        return self.norm(x)


def memory_efficient_attention(q, k, v, attn_bias=None, op=None, p=0.0,
                               scale=None):
    """Exact softmax attention over xformers layouts, fp32 accumulation."""
    assert p == 0.0
    squeeze = q.dim() == 3
    if squeeze:                                     # (B, M, K) → one head
        q, k, v = (t.unsqueeze(2) for t in (q, k, v))
    # (B, M, H, K) → (B, H, M, K)
    q, k, v = (t.transpose(1, 2) for t in (q, k, v))
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dt = q.dtype
    attn = torch.einsum("bhmk,bhnk->bhmn", q.float(), k.float()) * scale
    if attn_bias is not None:
        attn = attn + attn_bias.float()
    attn = attn.softmax(dim=-1)
    out = torch.einsum("bhmn,bhnk->bhmk", attn, v.float()).to(dt)
    out = out.transpose(1, 2)
    return out.squeeze(2) if squeeze else out


def unbind(x, dim=0):
    return torch.unbind(x, dim)


def sample_farthest_points(points, K=1, random_start_point=False):
    """pytorch3d.ops.sample_farthest_points semantics (deterministic start
    at index 0 when random_start_point=False): iteratively pick the point
    maximising the min distance to the selected set. Returns (pts, idx)."""
    if isinstance(K, torch.Tensor):
        K = int(K.max())
    B, N, _ = points.shape
    idx = torch.zeros(B, K, dtype=torch.long)
    if random_start_point:
        idx[:, 0] = torch.randint(0, N, (B,))
    mind = torch.full((B, N), float("inf"))
    for k in range(K):
        cur = points[torch.arange(B), idx[:, k]]            # (B, 3)
        d = ((points - cur[:, None]) ** 2).sum(-1)
        mind = torch.minimum(mind, d)
        if k + 1 < K:
            idx[:, k + 1] = mind.argmax(-1)
    sel = torch.gather(points, 1, idx[..., None].expand(-1, -1, 3))
    return sel, idx


def masked_gather(points, idx):
    """pytorch3d.ops.utils.masked_gather: gather rows by idx; idx == -1
    rows gather zeros."""
    mask = idx.eq(-1)
    idx_c = idx.clamp(min=0)
    out = torch.gather(points, 1,
                       idx_c[..., None].expand(-1, -1, points.shape[-1]))
    return out.masked_fill(mask[..., None], 0.0)


class _FusedDropoutBias(nn.Module):
    """xformers fused bias(+activation) stage: owns the bias of the
    preceding bias-less Linear, then optional exact GELU."""

    def __init__(self, dim, act):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(dim))
        self.act = act

    def forward(self, x):
        x = x + self.bias
        return F.gelu(x) if self.act else x


class FusedMLP(nn.Module):
    """xformers `fused_mlp.FusedMLP` (key layout mlp.{0,1,2,3}; exact
    GELU — the CUDA version's tanh-free gelu)."""

    def __init__(self, dim_model, dropout=0.0, activation=None,
                 hidden_layer_multiplier=4, **_ignore):
        super().__init__()
        hidden = dim_model * int(hidden_layer_multiplier)
        self.mlp = nn.Sequential(
            nn.Linear(dim_model, hidden, bias=False),
            _FusedDropoutBias(hidden, True),
            nn.Linear(hidden, dim_model, bias=False),
            _FusedDropoutBias(dim_model, False))

    def forward(self, x):
        return self.mlp(x)


class BlurPool2D(nn.Module):
    """kornia.filters.BlurPool2D stand-in: parameter-free anti-aliased box
    pool (unused by the golden forwards; exists so the ctor succeeds
    without adding state-dict keys)."""

    def __init__(self, kernel_size=(2, 2), stride=2):
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride

    def forward(self, x):
        return F.avg_pool2d(x, self.kernel_size, self.stride)


# ---------------------------------------------------------------------------
# stub machinery
# ---------------------------------------------------------------------------

class _Raise:
    def __init__(self, name):
        self._name = name

    def __call__(self, *a, **k):
        raise RuntimeError(f"reference shim stub called: {self._name}")

    def __getattr__(self, item):
        return _Raise(f"{self._name}.{item}")


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)

    def _getattr(item, _n=name):
        if item.startswith("__"):       # keep the import system sane
            raise AttributeError(item)
        return _Raise(f"{_n}.{item}")

    mod.__getattr__ = _getattr
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    mod.__path__ = []                   # act as a (sub-)package
    sys.modules[name] = mod
    return mod


def install():
    if "timm" in sys.modules and hasattr(sys.modules["timm"], "__shim__"):
        return
    # timm (faithful)
    timm = _stub_module("timm")
    timm.__shim__ = True
    _stub_module("timm.models")
    _stub_module("timm.models.vision_transformer",
                 PatchEmbed=PatchEmbed, Mlp=Mlp)

    # xformers (faithful attention; version high enough for the ref checks)
    xf = _stub_module("xformers", __version__="0.0.99")
    ops = _stub_module(
        "xformers.ops",
        memory_efficient_attention=memory_efficient_attention,
        unbind=unbind,
        fmha=_stub_module("xformers.ops.fmha"),
        MemoryEfficientAttentionFlashAttentionOp=None,
        MemoryEfficientAttentionCutlassOp=None,
    )
    xf.ops = ops
    # some reference modules import xformers.components unconditionally;
    # the constructed objects are never exercised by the golden tests
    comp = _stub_module("xformers.components")
    _stub_module("xformers.components.activations",
                 build_activation=lambda a=None: nn.GELU(),
                 Activation=type("Activation", (), {"GeLU": "gelu"}))
    fm = types.ModuleType("xformers.components.feedforward.fused_mlp")
    fm.FusedMLP = FusedMLP
    sys.modules["xformers.components.feedforward.fused_mlp"] = fm
    _stub_module("xformers.components.feedforward")
    sys.modules["xformers.components.feedforward"].fused_mlp = fm
    xf.components = comp

    # pure import-satisfying stubs
    _stub_module("blobfile", BlobFile=_Raise("blobfile.BlobFile"))
    k = _stub_module("kornia")
    k.filters = _stub_module("kornia.filters", BlurPool2D=BlurPool2D,
                             MedianBlur=BlurPool2D)
    _stub_module("point_cloud_utils")
    tv = _stub_module("torchvision")
    tv.transforms = _stub_module("torchvision.transforms")
    _stub_module("torchvision.utils", save_image=_Raise("save_image"))
    _stub_module("torchvision.ops",
                 masks_to_boxes=_Raise("masks_to_boxes"))
    p3d = _stub_module("pytorch3d")
    p3d.ops = _stub_module(
        "pytorch3d.ops", sample_farthest_points=sample_farthest_points)
    _stub_module("pytorch3d.ops.utils", masked_gather=masked_gather)
    _stub_module("pytorch3d.io")
    _stub_module("pytorch3d.structures")
    _stub_module("pytorch3d.loss")
    _stub_module("torchdiffeq", odeint=_Raise("torchdiffeq.odeint"))
    _stub_module("mpi4py", MPI=_Raise("mpi4py.MPI"))
    _stub_module("lpips", LPIPS=_Raise("lpips.LPIPS"))
    import torch.nn as _nn
    _stub_module("pytorch_lightning",
                 LightningModule=_nn.Module,   # subclassable base
                 seed_everything=_Raise("pl.seed_everything"))
    _stub_module("mcubes", marching_cubes=_Raise("mcubes.marching_cubes"))
    _stub_module("trimesh", Trimesh=_Raise("trimesh.Trimesh"))
    _stub_module("open3d")
    _stub_module("matplotlib")
    _stub_module("matplotlib.pyplot")
    _stub_module("imageio", imwrite=_Raise("imageio.imwrite"),
                 imread=_Raise("imageio.imread"))
    _stub_module("imageio.v3")
    _stub_module("kiui")
    _stub_module("kiui.op")
    _stub_module("kiui.typing")
    _stub_module("diff_surfel_rasterization",
                 GaussianRasterizationSettings=_Raise("GRSettings"),
                 GaussianRasterizer=_Raise("GRasterizer"))
    _stub_module("simple_knn")
    _stub_module("simple_knn._C", distCUDA2=_Raise("distCUDA2"))
    _stub_module("nvdiffrast")
    _stub_module("nvdiffrast.torch")
    _stub_module("xatlas")
    _stub_module("pymeshlab")
    _stub_module("wandb", init=_Raise("wandb.init"),
                 log=_Raise("wandb.log"))
    _stub_module("torchvision.transforms.v2")
    _stub_module("open_clip",
                 create_model_and_transforms=_Raise("open_clip.create"))
    _stub_module("webdataset")
    _stub_module("webdataset.shardlists")
    _stub_module("webdataset.handlers")
    _stub_module("webdataset.filters")
    _stub_module("omegaconf", OmegaConf=_Raise("OmegaConf"),
                 ListConfig=type("ListConfig", (), {}),
                 DictConfig=type("DictConfig", (), {}))
    _stub_module("safetensors")
    _stub_module("safetensors.torch", load_file=_Raise("load_file"))
    _stub_module("clip", load=_Raise("clip.load"),
                 tokenize=_Raise("clip.tokenize"))
    _stub_module("einx")
    _stub_module("natsort", natsorted=sorted)
    _stub_module("boto3")
    _stub_module("lmdb")
    _stub_module("h5py")
    _stub_module("Imath")
    _stub_module("OpenEXR")
    _stub_module("cv2", setNumThreads=lambda *a: None,
                 INTER_AREA=3, INTER_LINEAR=1, INTER_CUBIC=2,
                 INTER_NEAREST=0, IMREAD_UNCHANGED=-1)
    _stub_module("lz4")
    _stub_module("lz4.frame")
    _stub_module("plyfile", PlyData=_Raise("PlyData"),
                 PlyElement=_Raise("PlyElement"))
    _stub_module("pyspng")
    _stub_module("ipdb", set_trace=_Raise("ipdb.set_trace"))
    _stub_module("braceexpand", braceexpand=_Raise("braceexpand"))

    def _beartype_identity(fn=None, *a, **k):
        if callable(fn):
            return fn
        return lambda f: f

    bt = _stub_module("beartype", beartype=_beartype_identity)
    import typing as _typing
    btt = _stub_module("beartype.typing")
    for _n in ("List", "Union", "Optional", "Tuple", "Dict", "Any",
               "Callable", "Iterable", "Sequence"):
        setattr(btt, _n, getattr(_typing, _n))
    bt.typing = btt

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def patch_cuda_only_names():
    """dit/dit_models_xformers.py imports fused_mlp / Activation only when
    torch.cuda.is_available(); its CLAY blocks reference them at CONSTRUCTION.
    Inject the faithful shims into the module namespace post-import."""
    import dit.dit_models_xformers as m
    m.fused_mlp = sys.modules["xformers.components.feedforward.fused_mlp"]
    m.Activation = sys.modules["xformers.components.activations"].Activation
    m.build_activation = sys.modules[
        "xformers.components.activations"].build_activation
