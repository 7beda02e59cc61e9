"""End-to-end test of the checkpoint-import CLI
(`cli/import_release.py`): torch.save a mirror state dict (the TRUE
reference param names) → run the CLI → load the npz → params match the
direct converter output."""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                                                    # noqa: E402

from gaussiananything_tpu.cli.import_release import (          # noqa: E402
    load_torch_checkpoint, main)
from gaussiananything_tpu.utils.param_io import load_params_npz  # noqa: E402

from torch_mirror_ga import TorchClayDiT                       # noqa: E402


def test_dit_roundtrip(tmp_path):
    tm = TorchClayDiT(in_channels=3, dim=128, depth=2, heads=2, ctx_dim=96)
    pt = tmp_path / "dit.pt"
    torch.save(tm.state_dict(), pt)
    out = tmp_path / "dit.npz"
    main(["--kind", "dit-stage1", "--ckpt", str(pt), "--out", str(out),
          "--width", "128", "--depth", "2", "--heads", "2",
          "--cond-dim", "96"])
    params = load_params_npz(str(out))
    got = np.asarray(params["params"]["final_proj"]["kernel"])
    want = tm.final_layer.linear.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=0)
    assert len(jax.tree.leaves(params)) > 20


def test_unwraps_nested_and_ddp(tmp_path):
    tm = TorchClayDiT(in_channels=3, dim=128, depth=1, heads=2, ctx_dim=96)
    wrapped = {"state_dict": {f"module.{k}": v
                              for k, v in tm.state_dict().items()},
               "step": 100}
    pt = tmp_path / "wrapped.pt"
    torch.save(wrapped, pt)
    sd = load_torch_checkpoint(str(pt))
    assert "final_layer.linear.weight" in sd
    assert not any(k.startswith("module.") for k in sd)
    assert "step" not in sd
