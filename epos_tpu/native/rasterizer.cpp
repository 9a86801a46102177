// Headless software rasterizer for GT-field generation and visualization.
//
// TPU-native replacement for the reference's OpenGL/OSMesa bop_renderer
// (SURVEY.md §2.3): produces the same three outputs the pipeline consumes —
// depth image, object-local XYZ image (bop_renderer's get_local_pos_image,
// used at epos_lib/datagen_utils.py:226), and a flat-shaded color image
// (vis.py:165). The core entry point is a pure, stateless C function over
// caller-provided buffers, so it is reentrant and thread-safe by
// construction — unlike the reference renderer, which forces the input
// pipeline to a single reader (epos_lib/datagen.py:680-683).
//
// Build: make -C epos_tpu/native  (produces librasterizer.so; loaded via
// ctypes from epos_tpu/data/renderer.py, with a numpy fallback if absent).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Rasterizes a triangle mesh under a pinhole camera.
//
// V:        [nv * 3] doubles, model-space vertices (millimeters).
// F:        [nf * 3] ints, triangle vertex indices.
// C:        [nv * 3] uint8 per-vertex colors, may be null.
// UV:       [nv * 2] doubles, per-vertex texture coordinates in [0, 1]
//           (v = 0 at the BOTTOM of the texture, the BOP/OpenGL
//           convention). May be null.
// tex:      [th * tw * 3] uint8 texture image (row 0 = TOP). May be null;
//           texture sampling needs both UV and tex.
// R:        [9] row-major rotation (model -> camera).
// t:        [3] translation (model -> camera).
// fx,fy,cx,cy: pinhole intrinsics (pixel units).
// width,height: output resolution.
// depth_out: [h * w] float, 0 where no surface.
// xyz_out:  [h * w * 3] float, object-local coordinates of the visible
//           surface point (0 where no surface). May be null.
// rgb_out:  [h * w * 3] uint8 shaded color: textured (nearest texel) when
//           UV+tex are given, else interpolated vertex colors. May be null.
void rasterize_tex(const double* V, int nv, const int32_t* F, int nf,
                   const uint8_t* C, const double* UV,
                   const uint8_t* tex, int tw, int th,
                   const double* R, const double* t,
                   double fx, double fy, double cx, double cy,
                   int width, int height,
                   float* depth_out, float* xyz_out, uint8_t* rgb_out) {
  const bool textured = UV != nullptr && tex != nullptr && tw > 0 && th > 0;
  const int npx = width * height;
  std::memset(depth_out, 0, sizeof(float) * npx);
  if (xyz_out) std::memset(xyz_out, 0, sizeof(float) * npx * 3);
  if (rgb_out) std::memset(rgb_out, 0, sizeof(uint8_t) * npx * 3);

  // Transform vertices to camera space and project.
  // (Heap-allocated scratch; freed at exit. Kept local for reentrancy.)
  double* cam = new double[nv * 3];
  double* px = new double[nv * 2];
  for (int i = 0; i < nv; ++i) {
    const double x = V[i * 3], y = V[i * 3 + 1], z = V[i * 3 + 2];
    const double cxp = R[0] * x + R[1] * y + R[2] * z + t[0];
    const double cyp = R[3] * x + R[4] * y + R[5] * z + t[1];
    const double czp = R[6] * x + R[7] * y + R[8] * z + t[2];
    cam[i * 3] = cxp; cam[i * 3 + 1] = cyp; cam[i * 3 + 2] = czp;
    if (czp > 1e-6) {
      px[i * 2] = fx * cxp / czp + cx;
      px[i * 2 + 1] = fy * cyp / czp + cy;
    } else {
      px[i * 2] = px[i * 2 + 1] = -1e9;  // Behind the camera.
    }
  }

  // Light direction = viewing direction (headlight), for flat shading.
  for (int f = 0; f < nf; ++f) {
    const int ia = F[f * 3], ib = F[f * 3 + 1], ic = F[f * 3 + 2];
    if (ia < 0 || ib < 0 || ic < 0 || ia >= nv || ib >= nv || ic >= nv)
      continue;
    const double za = cam[ia * 3 + 2], zb = cam[ib * 3 + 2],
                 zc = cam[ic * 3 + 2];
    if (za <= 1e-6 || zb <= 1e-6 || zc <= 1e-6) continue;  // Clip near plane.

    const double ax = px[ia * 2], ay = px[ia * 2 + 1];
    const double bx = px[ib * 2], by = px[ib * 2 + 1];
    const double cx2 = px[ic * 2], cy2 = px[ic * 2 + 1];

    // Screen-space bounding box (pixel centers at integer + 0.5).
    int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx2}) - 0.5));
    int x1 = std::min(width - 1, (int)std::ceil(std::max({ax, bx, cx2})));
    int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy2}) - 0.5));
    int y1 = std::min(height - 1, (int)std::ceil(std::max({ay, by, cy2})));
    if (x0 > x1 || y0 > y1) continue;

    const double area = (bx - ax) * (cy2 - ay) - (by - ay) * (cx2 - ax);
    if (std::fabs(area) < 1e-12) continue;
    const double inv_area = 1.0 / area;

    // Flat shading intensity from the camera-space face normal.
    double shade = 1.0;
    if (rgb_out) {
      const double e1x = cam[ib * 3] - cam[ia * 3];
      const double e1y = cam[ib * 3 + 1] - cam[ia * 3 + 1];
      const double e1z = zb - za;
      const double e2x = cam[ic * 3] - cam[ia * 3];
      const double e2y = cam[ic * 3 + 1] - cam[ia * 3 + 1];
      const double e2z = zc - za;
      double nx_ = e1y * e2z - e1z * e2y;
      double ny_ = e1z * e2x - e1x * e2z;
      double nz_ = e1x * e2y - e1y * e2x;
      const double nn = std::sqrt(nx_ * nx_ + ny_ * ny_ + nz_ * nz_);
      if (nn > 0) shade = 0.4 + 0.6 * std::fabs(nz_ / nn);
    }

    const double iza = 1.0 / za, izb = 1.0 / zb, izc = 1.0 / zc;
    for (int yy = y0; yy <= y1; ++yy) {
      const double pyc = yy + 0.5;
      for (int xx = x0; xx <= x1; ++xx) {
        const double pxc = xx + 0.5;
        // Barycentric coordinates at the pixel center.
        double w0 = ((bx - pxc) * (cy2 - pyc) - (by - pyc) * (cx2 - pxc)) *
                    inv_area;
        double w1 = ((cx2 - pxc) * (ay - pyc) - (cy2 - pyc) * (ax - pxc)) *
                    inv_area;
        double w2 = 1.0 - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        // Perspective-correct interpolation in 1/z.
        const double iz = w0 * iza + w1 * izb + w2 * izc;
        const double z = 1.0 / iz;
        const int idx = yy * width + xx;
        if (depth_out[idx] != 0.0f && z >= depth_out[idx]) continue;
        depth_out[idx] = (float)z;
        const double ka = w0 * iza * z, kb = w1 * izb * z, kc = w2 * izc * z;
        if (xyz_out) {
          for (int d = 0; d < 3; ++d) {
            xyz_out[idx * 3 + d] = (float)(
                ka * V[ia * 3 + d] + kb * V[ib * 3 + d] + kc * V[ic * 3 + d]);
          }
        }
        if (rgb_out) {
          const uint8_t* texel = nullptr;
          if (textured) {
            // Perspective-correct UV; v flipped (texture row 0 = top).
            const double u = ka * UV[ia * 2] + kb * UV[ib * 2] +
                             kc * UV[ic * 2];
            const double v = ka * UV[ia * 2 + 1] + kb * UV[ib * 2 + 1] +
                             kc * UV[ic * 2 + 1];
            int tx = (int)std::lround(u * (tw - 1));
            int ty = (int)std::lround((1.0 - v) * (th - 1));
            tx = std::min(tw - 1, std::max(0, tx));
            ty = std::min(th - 1, std::max(0, ty));
            texel = tex + (ty * tw + tx) * 3;
          }
          for (int d = 0; d < 3; ++d) {
            double col;
            if (texel) {
              col = texel[d];
            } else if (C) {
              col = ka * C[ia * 3 + d] + kb * C[ib * 3 + d] +
                    kc * C[ic * 3 + d];
            } else {
              col = 200.0;
            }
            col *= shade;
            rgb_out[idx * 3 + d] =
                (uint8_t)std::min(255.0, std::max(0.0, col));
          }
        }
      }
    }
  }
  delete[] cam;
  delete[] px;
}

// Untextured compatibility entry point (vertex colors / constant gray).
void rasterize(const double* V, int nv, const int32_t* F, int nf,
               const uint8_t* C, const double* R, const double* t,
               double fx, double fy, double cx, double cy,
               int width, int height,
               float* depth_out, float* xyz_out, uint8_t* rgb_out) {
  rasterize_tex(V, nv, F, nf, C, nullptr, nullptr, 0, 0, R, t,
                fx, fy, cx, cy, width, height, depth_out, xyz_out, rgb_out);
}

}  // extern "C"
