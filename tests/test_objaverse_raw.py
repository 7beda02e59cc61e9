"""Raw-layout ingestion tests: EXR codec round-trip, reference decode
semantics (`datasets/g_buffer_objaverse.py:2047-2156,3225-3300`), and the
raw-chunk → canonical-instance → 15-channel batch path.
"""
import json
import os

import numpy as np
import pytest

from gaussiananything_tpu.data import objaverse_raw as raw


class TestEXR:
    def _roundtrip(self, compression, pixel_type, h=37, w=23):
        rng = np.random.default_rng(compression * 10 + pixel_type)
        chans = {
            "R": rng.standard_normal((h, w)).astype(np.float32),
            "G": rng.standard_normal((h, w)).astype(np.float32),
            "B": rng.standard_normal((h, w)).astype(np.float32),
            "A": rng.random((h, w)).astype(np.float32) * 3,
        }
        path = f"/tmp/test_{compression}_{pixel_type}.exr"
        raw.write_exr(path, chans, pixel_type=pixel_type,
                      compression=compression)
        out = raw.read_exr(path)
        for k in chans:
            if pixel_type == raw._PT_HALF:
                expect = chans[k].astype(np.float16).astype(np.float32)
            else:
                expect = chans[k]
            np.testing.assert_array_equal(out[k], expect,
                                          err_msg=f"channel {k}")
        os.remove(path)

    def test_zip_half_bitexact(self):
        self._roundtrip(raw._COMP_ZIP, raw._PT_HALF)

    def test_zips_half_bitexact(self):
        self._roundtrip(raw._COMP_ZIPS, raw._PT_HALF)

    def test_none_float_bitexact(self):
        self._roundtrip(raw._COMP_NONE, raw._PT_FLOAT)

    def test_zip_float_bitexact(self):
        self._roundtrip(raw._COMP_ZIP, raw._PT_FLOAT, h=16, w=16)

    def test_rejects_piz(self):
        path = "/tmp/test_piz.exr"
        raw.write_exr(path, {"R": np.zeros((4, 4), np.float32)},
                      compression=raw._COMP_ZIP)
        data = bytearray(open(path, "rb").read())
        i = data.index(b"compression\x00compression\x00")
        data[i + len(b"compression\x00compression\x00") + 4] = raw._COMP_PIZ
        with pytest.raises(ValueError):
            raw.read_exr(bytes(data))
        os.remove(path)


class TestDecodeHelpers:
    def test_read_dnormal_culls_and_orders(self):
        h = w = 16
        rng = np.random.default_rng(0)
        normal = rng.standard_normal((h, w, 3)).astype(np.float32)
        # camera at distance 2 → near_distance = 2 - 0.867 = 1.133
        depth = np.full((h, w), 1.8, np.float32)
        depth[0, :] = 0.5          # nearer than the cull plane → zeroed
        path = "/tmp/test_dn.exr"
        raw.write_exr(path, {
            "R": normal[..., 0], "G": normal[..., 1], "B": normal[..., 2],
            "A": depth}, pixel_type=raw._PT_FLOAT)
        d, n = raw.read_dnormal(path, np.array([2.0, 0.0, 0.0]))
        os.remove(path)
        assert (d[0] == 0).all() and np.allclose(d[1:], 1.8)
        # cv2 channel order: [B, G, R]
        np.testing.assert_allclose(n[..., 0], normal[..., 2], rtol=1e-6)
        np.testing.assert_allclose(n[..., 2], normal[..., 0], rtol=1e-6)

    def test_read_dnormal_resize(self):
        h = w = 8
        path = "/tmp/test_dn2.exr"
        raw.write_exr(path, {
            "R": np.zeros((h, w), np.float32),
            "G": np.zeros((h, w), np.float32),
            "B": np.zeros((h, w), np.float32),
            "A": np.full((h, w), 2.0, np.float32)},
            pixel_type=raw._PT_FLOAT)
        d, n = raw.read_dnormal(path, np.array([2.0, 0, 0]), h=4, w=4)
        os.remove(path)
        assert d.shape == (4, 4) and n.shape == (4, 4, 3)

    def test_read_dnormal_resize_nonsquare(self):
        """Regression: the resize gate compared WIDTH to the target
        HEIGHT, so non-square buffers skipped (or wrongly took) the
        resize."""
        path = "/tmp/test_dn3.exr"
        raw.write_exr(path, {
            "R": np.zeros((16, 8), np.float32),
            "G": np.zeros((16, 8), np.float32),
            "B": np.zeros((16, 8), np.float32),
            "A": np.full((16, 8), 2.0, np.float32)},
            pixel_type=raw._PT_FLOAT)
        # shape[1] == 8 == target h: the old gate skipped the resize here
        d, n = raw.read_dnormal(path, np.array([2.0, 0, 0]), h=8, w=4)
        os.remove(path)
        assert d.shape == (8, 4) and n.shape == (8, 4, 3)

    def test_unity2blender_fix(self):
        n = np.array([[[1.0, 2.0, 3.0]]])
        out = raw.unity2blender_fix(n)
        # reference (`:2140-2148`): x=-x, y=-z, z=+y
        np.testing.assert_array_equal(out, [[[-1.0, -3.0, 2.0]]])

    def test_pose_json_and_25d(self):
        j = {"x": [1, 0, 0], "y": [0, 1, 0], "z": [0, 0, 1],
             "origin": [0.1, 0.2, 0.3]}
        path = "/tmp/test_pose.json"
        with open(path, "w") as f:
            json.dump(j, f)
        c2w = raw.read_camera_matrix_single(path)
        os.remove(path)
        assert c2w.shape == (4, 4)
        np.testing.assert_allclose(c2w[:3, 3], [0.1, 0.2, 0.3])
        p = raw.pose_25d(c2w, 512, 512)
        assert p.shape == (25,)
        K = p[16:].reshape(3, 3)
        # fx normalised by h: 1422.222 * 512/1024 / 512
        np.testing.assert_allclose(K[0, 0], 1422.222 / 1024, rtol=1e-5)
        np.testing.assert_allclose(K[0, 2], 0.5, rtol=1e-6)

    def test_erode_cross(self):
        m = np.zeros((5, 5), np.float32)
        m[1:4, 1:4] = 1
        e = raw._erode_cross(m)
        expect = np.zeros((5, 5), np.float32)
        expect[2, 2] = 1
        np.testing.assert_array_equal(e, expect)

    def test_depth_dequant_formula(self):
        # d = 1 / ((q/255)*(far-near) + near), culled past 2.9
        q = np.array([[0, 255]], np.float32)
        near, far = 0.4, 1.2
        d = 1.0 / ((q / 255.0) * (far - near) + near)
        np.testing.assert_allclose(d, [[2.5, 1 / 1.2]], rtol=1e-6)


def _synth_chunk(tmpdir, V=4, h=16, w=16, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    rgb = (rng.random((V, h, w, 3)) * 255).astype(np.uint8)
    strip = rgb.transpose(1, 0, 2, 3).reshape(h, V * w, 3)
    Image.fromarray(strip).save(os.path.join(tmpdir, "raw_img.png"))
    alpha = np.full((V, h, w), 255, np.uint8)
    Image.fromarray(alpha.transpose(1, 0, 2).reshape(h, V * w)).save(
        os.path.join(tmpdir, "alpha.png"))
    depth = rng.random((V, h, w)).astype(np.float32) + 1.0
    np.savez(os.path.join(tmpdir, "depth.npz"), depth=depth)
    normal01 = rng.random((V, h, w, 3)).astype(np.float32)
    nstrip = (normal01.transpose(1, 0, 2, 3).reshape(h, V * w, 3) * 255
              ).astype(np.uint8)
    Image.fromarray(nstrip).save(os.path.join(tmpdir, "normal.png"))
    # 25-dim poses: camera on a ring, reuse the repo camera generator
    from gaussiananything_tpu.render import cameras
    poses = np.asarray(cameras.generate_input_camera(
        1.8, [(20, 45 + 90 * i) for i in range(V)]))
    np.save(os.path.join(tmpdir, "c.npy"), poses.astype(np.float32))
    np.save(os.path.join(tmpdir, "bbox.npy"),
            np.array([[-0.45] * 3, [0.45] * 3], np.float32))
    for name, txt in (("caption.txt", "a test object"),
                      ("ins.txt", "fixture/0")):
        with open(os.path.join(tmpdir, name), "w") as f:
            f.write(txt)
    return rgb, depth


class TestChunkLayout:
    def test_read_chunk_roundtrip(self, tmp_path):
        d = str(tmp_path)
        rgb0, depth0 = _synth_chunk(d)
        rgb, depth, normal, alpha, c, bbox, caption, ins = raw.read_chunk(
            d, chunk_size=4, img_ext="png")
        np.testing.assert_array_equal(rgb, rgb0)
        np.testing.assert_allclose(depth, depth0, rtol=1e-6)
        assert normal.shape == (4, 16, 16, 3)
        assert c.shape == (4, 25)
        assert caption == "a test object" and ins == "fixture/0"

    def test_raw_to_15ch_batch(self, tmp_path):
        """Raw chunk → canonical npz → MultiViewDataset → 15-ch encoder
        batch (the full reference ingestion contract)."""
        rawdir = str(tmp_path / "raw" / "000")
        os.makedirs(rawdir)
        _synth_chunk(rawdir)
        outdir = str(tmp_path / "packed")
        n = raw.convert_raw_dir(str(tmp_path / "raw"), outdir,
                                chunk_size=4, img_ext="png")
        assert n == 1
        from gaussiananything_tpu.data.gbuffer import MultiViewDataset
        ds = MultiViewDataset(outdir, n_views_in=2, n_views_sup=2,
                              n_points=256)
        b = ds.batch(2)
        assert b["images_in"].shape[:3] == (2, 2, 15)
        assert b["images_sup"].shape == (2, 2, 3, 16, 16)
        assert b["pcd"].shape == (2, 256, 3)
        for k, v in b.items():
            if k == "caption":          # string sidecar, not a tensor
                assert isinstance(v, list)
                continue
            assert np.isfinite(np.asarray(v)).all(), k
