// Z-buffer mesh rasterizer for eval-time mesh visualizations.
//
// The reference renders the extracted mesh from training views with a
// pytorch3d GPU rasterizer (scripts/render_utils.py:418-421 render_mesh,
// scripts/pytorch3d_utils.py:408 Render; flag scripts/run.py:68
// --shaded_mesh) and writes frame_XXXXXX_mesh.png normal/shaded images.
// A TPU service has no GPU display stack, so this is a small native
// scanline rasterizer: flat-shaded triangles with a float z-buffer, either
// a world-space normal map (0.5*n+0.5, the reference's default) or
// Lambertian grey shading with a headlight.
//
// Projection convention matches engine/rays.py pixel_to_ray (reference
// common_device.cuh:246-310): camera-space +Z forward,
// x_pix = fx*X/Z + cx_pix, y_pix = fy*Y/Z + cy_pix.
//
// Single-threaded: ~1M-face meshes rasterize in a few hundred ms, which is
// negligible next to the field renders it accompanies.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// verts: (n_verts, 3) world-space; faces: (n_faces, 3) int32;
// w2c: 3x4 row-major world-to-camera; out_rgb: (H, W, 3) float
// (background stays 0); out_depth: (H, W) float (0 where no hit);
// shaded: 0 = normal map, 1 = Lambertian; light_dir: world-space light
// direction (may be null; defaults to the camera's -Z i.e. a headlight).
void raster_mesh(const float* verts, int64_t n_verts, const int32_t* faces,
                 int64_t n_faces, const float* w2c, float fx, float fy,
                 float cx_pix, float cy_pix, int W, int H, int shaded,
                 const float* light_dir, float* out_rgb, float* out_depth) {
  const float kEps = 1e-6f;
  std::vector<float> cam(n_verts * 3);   // camera-space verts
  std::vector<float> pix(n_verts * 2);   // projected pixel coords
  for (int64_t i = 0; i < n_verts; i++) {
    const float* v = verts + 3 * i;
    for (int r = 0; r < 3; r++) {
      cam[3 * i + r] = w2c[4 * r + 0] * v[0] + w2c[4 * r + 1] * v[1] +
                       w2c[4 * r + 2] * v[2] + w2c[4 * r + 3];
    }
    float z = std::max(cam[3 * i + 2], kEps);
    pix[2 * i + 0] = fx * cam[3 * i + 0] / z + cx_pix;
    pix[2 * i + 1] = fy * cam[3 * i + 1] / z + cy_pix;
  }

  // Camera position / axes (w2c = [R|t], c2w rotation = R^T).
  float cam_pos[3], cam_fwd[3];
  for (int a = 0; a < 3; a++) {
    cam_pos[a] = -(w2c[0 * 4 + a] * w2c[3] + w2c[1 * 4 + a] * w2c[7] +
                   w2c[2 * 4 + a] * w2c[11]);
    cam_fwd[a] = w2c[2 * 4 + a];  // world-space +Z (view) axis
  }
  float light[3];
  if (light_dir) {
    float n = std::sqrt(light_dir[0] * light_dir[0] +
                        light_dir[1] * light_dir[1] +
                        light_dir[2] * light_dir[2]);
    n = n > kEps ? n : 1.0f;
    for (int a = 0; a < 3; a++) light[a] = light_dir[a] / n;
  } else {
    for (int a = 0; a < 3; a++) light[a] = -cam_fwd[a];  // headlight
  }

  std::vector<float> zbuf((size_t)W * H, 1e30f);
  std::memset(out_rgb, 0, sizeof(float) * 3 * W * H);
  std::memset(out_depth, 0, sizeof(float) * W * H);

  for (int64_t f = 0; f < n_faces; f++) {
    const int32_t* tri = faces + 3 * f;
    const int32_t i0 = tri[0], i1 = tri[1], i2 = tri[2];
    const float z0 = cam[3 * i0 + 2], z1 = cam[3 * i1 + 2],
                z2 = cam[3 * i2 + 2];
    if (z0 <= kEps || z1 <= kEps || z2 <= kEps) continue;  // behind camera

    const float x0 = pix[2 * i0], y0 = pix[2 * i0 + 1];
    const float x1 = pix[2 * i1], y1 = pix[2 * i1 + 1];
    const float x2 = pix[2 * i2], y2 = pix[2 * i2 + 1];

    const float area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
    if (std::fabs(area) < kEps) continue;  // degenerate in screen space

    int xmin = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    int xmax = std::min(W - 1, (int)std::ceil(std::max({x0, x1, x2})));
    int ymin = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    int ymax = std::min(H - 1, (int)std::ceil(std::max({y0, y1, y2})));
    if (xmin > xmax || ymin > ymax) continue;

    // World-space face normal, oriented toward the camera.
    const float* a = verts + 3 * i0;
    const float* b = verts + 3 * i1;
    const float* c = verts + 3 * i2;
    float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    float e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    float nrm[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                    e1[2] * e2[0] - e1[0] * e2[2],
                    e1[0] * e2[1] - e1[1] * e2[0]};
    float nl = std::sqrt(nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2]);
    if (nl < kEps) continue;
    for (int d = 0; d < 3; d++) nrm[d] /= nl;
    float to_cam[3] = {cam_pos[0] - a[0], cam_pos[1] - a[1], cam_pos[2] - a[2]};
    if (nrm[0] * to_cam[0] + nrm[1] * to_cam[1] + nrm[2] * to_cam[2] < 0)
      for (int d = 0; d < 3; d++) nrm[d] = -nrm[d];

    float rgb[3];
    if (shaded) {
      float lambert = std::max(
          nrm[0] * light[0] + nrm[1] * light[1] + nrm[2] * light[2], 0.0f);
      float v = 0.15f + 0.8f * lambert;
      rgb[0] = rgb[1] = rgb[2] = v;
    } else {
      for (int d = 0; d < 3; d++) rgb[d] = 0.5f * nrm[d] + 0.5f;
    }

    const float inv_area = 1.0f / area;
    for (int y = ymin; y <= ymax; y++) {
      for (int x = xmin; x <= xmax; x++) {
        const float px = x + 0.5f, py = y + 0.5f;
        float w0 = ((x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)) * inv_area;
        float w1 = ((x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)) * inv_area;
        float w2 = 1.0f - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        // Perspective-correct depth: interpolate 1/z linearly in screen.
        float inv_z = w0 / z0 + w1 / z1 + w2 / z2;
        float z = 1.0f / std::max(inv_z, 1e-12f);
        float* zp = &zbuf[(size_t)y * W + x];
        if (z < *zp) {
          *zp = z;
          float* o = out_rgb + 3 * ((size_t)y * W + x);
          o[0] = rgb[0];
          o[1] = rgb[1];
          o[2] = rgb[2];
          out_depth[(size_t)y * W + x] = z;
        }
      }
    }
  }
}

}  // extern "C"
