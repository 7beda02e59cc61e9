// Native mesh-extraction + IO runtime for gaussiananything_tpu.
//
// The reference delegates its mesh path to native code (Open3D's C++
// ScalableTSDFVolume + marching cubes, `nsr/lsgm/flow_matching_trainer.py:
// 1319-1343`); this library is the TPU build's equivalent: a fast
// surface-nets extractor over the TSDF grid produced on-device by
// `render/tsdf.py`, plus binary PLY encode for large splat sets.
//
// Build: make -C native   (produces libganative.so, loaded via ctypes).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

}  // namespace

extern "C" {

// Surface nets over a D^3 TSDF grid.
// tsdf: D*D*D floats (C order); color: D*D*D*3 floats or nullptr.
// Outputs: verts (n_verts*3), cols (n_verts*3, if color), faces
// (n_faces*3 int32). Returns 0 on success, -1 if caps exceeded.
int ga_surface_nets(const float* tsdf, const float* color, int D,
                    float bound, float* out_verts, float* out_cols,
                    int32_t* out_faces, int64_t vert_cap, int64_t face_cap,
                    int64_t* n_verts, int64_t* n_faces) {
  const int C = D - 1;  // cells per axis
  const float voxel = 2.0f * bound / D;
  auto sdf = [&](int i, int j, int k) -> float {
    return tsdf[(int64_t)i * D * D + (int64_t)j * D + k];
  };

  std::vector<int64_t> cell_idx((int64_t)C * C * C, -1);
  auto cidx = [&](int i, int j, int k) -> int64_t& {
    return cell_idx[(int64_t)i * C * C + (int64_t)j * C + k];
  };

  int64_t nv = 0;
  for (int i = 0; i < C; i++) {
    for (int j = 0; j < C; j++) {
      for (int k = 0; k < C; k++) {
        bool s0 = sdf(i, j, k) < 0.f;
        bool change = false;
        for (int d = 1; d < 8 && !change; d++) {
          int di = (d >> 2) & 1, dj = (d >> 1) & 1, dk = d & 1;
          change = (sdf(i + di, j + dj, k + dk) < 0.f) != s0;
        }
        if (!change) continue;
        if (nv >= vert_cap) return -1;
        // SDF-weighted centroid of the 8 corners
        float wsum = 0.f, cx = 0.f, cy = 0.f, cz = 0.f;
        for (int d = 0; d < 8; d++) {
          int di = (d >> 2) & 1, dj = (d >> 1) & 1, dk = d & 1;
          float w = 1.0f / (std::fabs(sdf(i + di, j + dj, k + dk)) + 1e-4f);
          wsum += w;
          cx += w * di;
          cy += w * dj;
          cz += w * dk;
        }
        cx /= wsum;
        cy /= wsum;
        cz /= wsum;
        out_verts[nv * 3 + 0] = (i + cx + 0.5f) * voxel - bound;
        out_verts[nv * 3 + 1] = (j + cy + 0.5f) * voxel - bound;
        out_verts[nv * 3 + 2] = (k + cz + 0.5f) * voxel - bound;
        if (color && out_cols) {
          int ci = (int)std::lround(i + cx);
          int cj = (int)std::lround(j + cy);
          int ck = (int)std::lround(k + cz);
          ci = ci < 0 ? 0 : (ci >= D ? D - 1 : ci);
          cj = cj < 0 ? 0 : (cj >= D ? D - 1 : cj);
          ck = ck < 0 ? 0 : (ck >= D ? D - 1 : ck);
          const float* cp =
              color + ((int64_t)ci * D * D + (int64_t)cj * D + ck) * 3;
          out_cols[nv * 3 + 0] = cp[0];
          out_cols[nv * 3 + 1] = cp[1];
          out_cols[nv * 3 + 2] = cp[2];
        }
        cidx(i, j, k) = nv++;
      }
    }
  }

  // faces: for each grid edge along each axis with a sign change, connect
  // the 4 adjacent cells (two triangles), winding by the sign direction.
  int64_t nf = 0;
  const int axes[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int a = 0; a < 3; a++) {
    int ax = axes[a][0], ay = axes[a][1], az = axes[a][2];
    // the two perpendicular axes, in sorted order (matches the python
    // fallback's winding convention)
    int b = (a == 0) ? 1 : 0, c = (a == 2) ? 1 : 2;
    int bx = axes[b][0], by = axes[b][1], bz = axes[b][2];
    int cx2 = axes[c][0], cy2 = axes[c][1], cz2 = axes[c][2];
    for (int i = (a == 0 ? 0 : 1); i < (a == 0 ? C : D - 1); i++) {
      for (int j = (a == 1 ? 0 : 1); j < (a == 1 ? C : D - 1); j++) {
        for (int k = (a == 2 ? 0 : 1); k < (a == 2 ? C : D - 1); k++) {
          float s0 = sdf(i, j, k);
          float s1 = sdf(i + ax, j + ay, k + az);
          if ((s0 < 0.f) == (s1 < 0.f)) continue;
          int64_t q[4];
          bool ok = true;
          const int offs[4][2] = {{0, 0}, {-1, 0}, {-1, -1}, {0, -1}};
          for (int t = 0; t < 4 && ok; t++) {
            int ii = i + offs[t][0] * bx + offs[t][1] * cx2;
            int jj = j + offs[t][0] * by + offs[t][1] * cy2;
            int kk = k + offs[t][0] * bz + offs[t][1] * cz2;
            if (ii < 0 || jj < 0 || kk < 0 || ii >= C || jj >= C ||
                kk >= C) {
              ok = false;
              break;
            }
            q[t] = cidx(ii, jj, kk);
            ok = q[t] >= 0;
          }
          if (!ok) continue;
          if (nf + 2 > face_cap) return -1;
          bool flip = s1 < 0.f;
          int64_t v0 = q[0], v1 = flip ? q[3] : q[1], v2 = q[2],
                  v3 = flip ? q[1] : q[3];
          out_faces[nf * 3 + 0] = (int32_t)v0;
          out_faces[nf * 3 + 1] = (int32_t)v1;
          out_faces[nf * 3 + 2] = (int32_t)v2;
          nf++;
          out_faces[nf * 3 + 0] = (int32_t)v0;
          out_faces[nf * 3 + 1] = (int32_t)v2;
          out_faces[nf * 3 + 2] = (int32_t)v3;
          nf++;
        }
      }
    }
  }
  *n_verts = nv;
  *n_faces = nf;
  return 0;
}

// Binary little-endian PLY with float32 vertex properties.
// fields: n_fields column-major names packed "x\0y\0z\0..."; data row-major
// (n, n_fields). Returns 0 on success.
int ga_write_ply(const char* path, const char* field_names, int n_fields,
                 const float* data, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f, "ply\nformat binary_little_endian 1.0\nelement vertex %lld\n",
          (long long)n);
  const char* p = field_names;
  for (int i = 0; i < n_fields; i++) {
    fprintf(f, "property float %s\n", p);
    p += strlen(p) + 1;
  }
  fprintf(f, "end_header\n");
  size_t written = fwrite(data, sizeof(float), (size_t)n * n_fields, f);
  fclose(f);
  return written == (size_t)n * n_fields ? 0 : -1;
}

}  // extern "C"

// Projective TSDF fusion over V views — the Open3D ScalableTSDFVolume
// integrate role (`nsr/lsgm/flow_matching_trainer.py:1319,1338-1343`),
// reimplemented dense + OpenMP. Row-vector camera convention: view =
// [x y z 1] @ cam_view (cam_view passed row-major (V, 4, 4)).
// depths/alphas: (V, H, W); colors: (V, 3, H, W). Outputs tsdf (D^3)
// init 1.0, color (D^3, 3); voxel grid covers [-bound, bound]^3 with
// centres at (i + 0.5)/D * 2*bound - bound, x-major (i, j, k) order
// matching the JAX path's meshgrid(indexing="ij").
extern "C" int ga_tsdf_integrate(
    const float* depths, const float* colors, const float* alphas,
    const float* cam_view, int V, int H, int W, float tanfov, int D,
    float bound, float trunc, float alpha_thres,
    float* tsdf, float* weight, float* color_out) {
  const int64_t n = (int64_t)D * D * D;
  const float step = 2.0f * bound / D;
#pragma omp parallel for schedule(static)
  for (int64_t idx = 0; idx < n; idx++) {
    const int i = (int)(idx / ((int64_t)D * D));
    const int j = (int)((idx / D) % D);
    const int k = (int)(idx % D);
    const float gx = (i + 0.5f) * step - bound;
    const float gy = (j + 0.5f) * step - bound;
    const float gz = (k + 0.5f) * step - bound;
    float t = 1.0f, w = 0.0f, c0 = 0.0f, c1 = 0.0f, c2 = 0.0f;
    for (int vi = 0; vi < V; vi++) {
      const float* cv = cam_view + (int64_t)vi * 16;
      const float vx = gx * cv[0] + gy * cv[4] + gz * cv[8] + cv[12];
      const float vy = gx * cv[1] + gy * cv[5] + gz * cv[9] + cv[13];
      const float vz = gx * cv[2] + gy * cv[6] + gz * cv[10] + cv[14];
      if (vz <= 0.05f) continue;
      const float u = ((vx / (vz * tanfov)) + 1.0f) * 0.5f * W - 0.5f;
      const float v = ((vy / (vz * tanfov)) + 1.0f) * 0.5f * H - 0.5f;
      if (u < 0.0f || u > W - 1 || v < 0.0f || v > H - 1) continue;
      const int u0 = (int)u, v0 = (int)v;
      const int u1 = u0 + 1 < W ? u0 + 1 : W - 1;
      const int v1 = v0 + 1 < H ? v0 + 1 : H - 1;
      const float fu = u - u0, fv = v - v0;
      const float w00 = (1 - fu) * (1 - fv), w10 = fu * (1 - fv);
      const float w01 = (1 - fu) * fv, w11 = fu * fv;
      const float* dep = depths + (int64_t)vi * H * W;
      const float* alp = alphas + (int64_t)vi * H * W;
#define BILERP(img) (img[v0 * W + u0] * w00 + img[v0 * W + u1] * w10 \
                     + img[v1 * W + u0] * w01 + img[v1 * W + u1] * w11)
      const float d_px = BILERP(dep);
      const float a_px = BILERP(alp);
      if (a_px <= alpha_thres || d_px <= 0.05f) continue;
      const float sdf = d_px - vz;
      if (sdf <= -trunc) continue;
      float s = sdf / trunc;
      s = s > 1.0f ? 1.0f : (s < -1.0f ? -1.0f : s);
      const float* cr = colors + ((int64_t)vi * 3 + 0) * H * W;
      const float* cg = colors + ((int64_t)vi * 3 + 1) * H * W;
      const float* cb = colors + ((int64_t)vi * 3 + 2) * H * W;
      const float nw = w + 1.0f;
      t = (t * w + s) / nw;
      c0 = (c0 * w + BILERP(cr)) / nw;
      c1 = (c1 * w + BILERP(cg)) / nw;
      c2 = (c2 * w + BILERP(cb)) / nw;
      w = nw;
#undef BILERP
    }
    tsdf[idx] = w > 0.0f ? t : 1.0f;
    weight[idx] = w;
    color_out[idx * 3 + 0] = c0;
    color_out[idx * 3 + 1] = c1;
    color_out[idx * 3 + 2] = c2;
  }
  return 0;
}
