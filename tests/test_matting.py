"""U²-Net matting (the rembg backbone): architecture, torch-weight
conversion, and the data/real.py integration.

Reference consumption: `utils/infer_utils.py:4,27` (`rembg.remove` runs a
pretrained U²-Net). Weights are not downloadable here, so the tests
validate (a) the flax architecture's output contract, (b) that a
synthesized torch state dict with the TRUE u2net parameter names converts
losslessly and with full coverage, (c) the soft-alpha compositing path.
"""
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

import jax
import jax.numpy as jnp

from gaussiananything_tpu.models import matting
from gaussiananything_tpu.utils import param_io


def _inverse_torch_name(flax_path: str) -> str:
    """flax 'a/b/c' path → canonical torch u2net name (the map's inverse)."""
    parts = flax_path.split("/")
    if parts[0].startswith("side") or parts[0] == "outconv":
        return f"{parts[0]}." + ("weight" if parts[1] == "kernel" else "bias")
    stage, block, leaf = parts[0], parts[1], parts[-1]
    if parts[2] == "conv_s1":
        return f"{stage}.{block}.conv_s1." + (
            "weight" if leaf == "kernel" else "bias")
    table = {"bn_scale": "weight", "bn_bias": "bias",
             "bn_mean": "running_mean", "bn_var": "running_var"}
    return f"{stage}.{block}.bn_s1.{table[parts[2]]}"


@pytest.fixture(scope="module")
def small_net_and_params():
    net = matting.u2netp()
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, 64, 64, 3)))
    return net, params


class TestArchitecture:
    def test_output_shape_and_range(self, small_net_and_params):
        net, params = small_net_and_params
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        out = net.apply(params, x)
        assert out.shape == (2, 64, 64, 1)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_side_outputs(self, small_net_and_params):
        net, params = small_net_and_params
        x = jnp.zeros((1, 64, 64, 3))
        fused, sides = net.apply(params, x, side_outputs=True)
        assert len(sides) == 6
        assert all(s.shape == fused.shape for s in sides)

    def test_full_u2net_param_names(self):
        """The full net's param tree carries exactly the torch stage/side
        names (spot-check the canonical ones)."""
        tab = jax.eval_shape(
            lambda: matting.u2net().init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 32, 32, 3))))
        flat = flatten_dict(tab["params"], sep="/")
        for k in ("stage1/rebnconvin/conv_s1/kernel",
                  "stage1/rebnconv7/bn_var",
                  "stage6/rebnconv4/conv_s1/kernel",
                  "stage5d/rebnconvin/bn_mean",
                  "stage1d/rebnconv1d/conv_s1/bias",
                  "side6/kernel", "outconv/kernel"):
            assert k in flat, k
        # torch U2NET(3,1): stage1 RSU7(3,32,64) → conv_in 64 out; side
        # convs emit 1 channel; outconv fuses 6 maps.
        assert flat["stage1/rebnconvin/conv_s1/kernel"].shape[-1] == 64
        assert flat["side1/kernel"].shape[-2:] == (64, 1)
        assert flat["outconv/kernel"].shape == (1, 1, 6, 1)


class TestConversion:
    def test_roundtrip_full_coverage(self, small_net_and_params):
        net, params = small_net_and_params
        flat = flatten_dict(params["params"], sep="/")
        rng = np.random.default_rng(0)
        state = {}
        for path, leaf in flat.items():
            # small magnitude: N(0,1) conv stacks overflow fp32 through
            # ~40 layers; the test checks conversion, not calibration
            arr = (0.02 * rng.normal(size=np.asarray(leaf).shape)
                   ).astype(np.float32)
            if arr.ndim == 4:                      # HWIO → torch OIHW
                arr = arr.transpose(3, 2, 0, 1)
            state[_inverse_torch_name(path)] = arr
        # canonical names really are the torch ones
        assert "stage1.rebnconvin.conv_s1.weight" in state
        assert "stage5d.rebnconv1d.bn_s1.running_var" in state
        assert "outconv.bias" in state
        state["stage1.rebnconvin.bn_s1.num_batches_tracked"] = np.zeros(())

        conv = param_io.convert_u2net(state, params)
        cflat = flatten_dict(conv["params"], sep="/")
        assert set(cflat) == set(flat)
        # every leaf overwritten (none left at init values), transposed back
        for path in flat:
            src = state[_inverse_torch_name(path)]
            if src.ndim == 4:
                src = src.transpose(2, 3, 1, 0)
            np.testing.assert_array_equal(cflat[path], src)
        # converted tree runs (bn_var is N(0,1) here — finiteness only
        # holds where var+eps > 0, so clamp for the smoke apply)
        conv["params"] = jax.tree.map(lambda a: np.abs(a), conv["params"])
        out = net.apply(conv, jnp.zeros((1, 32, 32, 3)))
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError):
            param_io.u2net_name_map("decoder.mystery.weight")


class TestIntegration:
    def test_matting_alpha_and_composite(self, small_net_and_params):
        from gaussiananything_tpu.data.real import remove_background
        net, params = small_net_and_params
        img = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(2), (96, 80, 3)), np.float32)
        a = matting.matting_alpha(params, jnp.asarray(img), res=64, net=net)
        assert a.shape == (96, 80)
        assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0

        out = remove_background(img)               # heuristic path
        assert out.shape == img.shape and np.isfinite(out).all()
