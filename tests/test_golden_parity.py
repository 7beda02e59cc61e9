"""Release-shape golden parity: the committed artifact from
`tools/golden_parity_512.py` (tiled vs unbinned oracle at 512²/73,728
splats, run on the TPU) must exist and be inside tolerance.

This is the executable record of VERDICT item 2(a): the production tiled
path agrees with the every-splat-every-pixel oracle at the release shape,
pinning the full binning pipeline to the 2DGS compositing semantics of
`diff-surfel-rasterization` (`nsr/gs_surfel.py:85-142`). Regenerate with
`python -m tools.golden_parity_512` on the chip after rasterizer changes.
"""
import json
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "goldens", "parity_512.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ART):
        pytest.fail("tests/goldens/parity_512.json missing — run "
                    "`python -m tools.golden_parity_512` on the TPU")
    with open(ART) as f:
        return json.load(f)


def test_release_shape(artifact):
    assert artifact["res"] == 512
    assert artifact["n_splats"] == 73728
    assert len(artifact["views"]) >= 3


def test_errors_within_tolerance(artifact):
    assert artifact["pass"] is True
    for ch, rec in artifact["channels"].items():
        if ch == "depth_median":
            # Median depth selects the splat at the T=0.5 crossing — a
            # knife-edge the CUDA channel shares (nsr/gs_surfel.py:132):
            # a last-ulp transmittance difference flips the selection and
            # the error equals the inter-splat gap. Criterion: p99.9 in
            # tol, flip fraction ≤ 1e-4, flips bounded (old artifacts
            # without quantile fields fall back to strict max).
            if "p999" in rec:
                assert rec["p999"] <= rec["tol"], (ch, rec)
                assert rec["frac_beyond_tol"] <= 1e-4, (ch, rec)
                assert rec["max_abs_diff"] <= 0.2, (ch, rec)
            else:
                assert rec["max_abs_diff"] <= rec["tol"], (ch, rec)
        else:
            assert rec["max_abs_diff"] <= rec["tol"], (ch, rec)


def test_image_hashes_recorded(artifact):
    assert len(artifact["tiled_image_sha256"]) == len(artifact["views"])
    assert all(len(h) == 64 for h in artifact["tiled_image_sha256"])


# --- fused production path (Pallas v4 fwd + analytic bwd) -------------------

ART_FUSED = os.path.join(os.path.dirname(__file__), "goldens",
                         "parity_512_fused.json")


@pytest.fixture(scope="module")
def fused_artifact():
    if not os.path.exists(ART_FUSED):
        pytest.fail("tests/goldens/parity_512_fused.json missing — run "
                    "`python -m tools.golden_parity_512 --impl fused` on "
                    "the TPU (the artifact pins the TRAINING path, both "
                    "directions — VERDICT r4 item 2)")
    with open(ART_FUSED) as f:
        return json.load(f)


def test_fused_generated_on_device(fused_artifact):
    assert fused_artifact["impl"] == "fused"
    assert "TPU" in fused_artifact["device"].upper(), (
        "fused parity artifact must be regenerated ON the TPU "
        f"(got device={fused_artifact['device']!r})")


def test_fused_forward_parity(fused_artifact):
    assert fused_artifact["pass"] is True
    for ch, rec in fused_artifact["channels"].items():
        if ch == "depth_median":
            assert rec["p999"] <= rec["tol"], (ch, rec)
            assert rec["frac_beyond_tol"] <= 1e-4, (ch, rec)
            assert rec["max_abs_diff"] <= 0.2, (ch, rec)
        else:
            assert rec["max_abs_diff"] <= rec["tol"], (ch, rec)
    for ch, rec in fused_artifact["vs_xla"].items():
        if ch != "depth_median":
            assert rec["max_abs_diff"] <= rec["tol"], (ch, rec)


def test_fused_backward_parity(fused_artifact):
    rec = fused_artifact["grad"]
    assert rec["max_abs_diff"] <= rec["tol"], rec
