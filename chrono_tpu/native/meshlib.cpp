// chrono_tpu native mesh runtime: OBJ loading + triangle grid binning.
//
// Host-side geometry preprocessing for the DEM/FSI mesh coupling — the role
// the reference fills with its C++ mesh utilities (ChTriangleMeshConnected,
// tinyobjloader, and the host layers of chrono_dem's trimesh path).  The hot
// per-step compute stays in XLA; this library owns the file IO and the
// irregular, pointer-chasing preprocessing XLA is bad at: parsing, AABB
// binning, vertex dedup.  Exposed via a C ABI for ctypes (no pybind11 in the
// image).
//
// Build: see chrono_tpu/native/build.py  (g++ -O3 -shared -fPIC)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Mesh {
  std::vector<float> verts;    // xyz triplets
  std::vector<int32_t> faces;  // vertex-index triplets (triangulated)
};

// registry of loaded meshes (handle-based API for ctypes)
std::vector<Mesh*> g_meshes;

}  // namespace

extern "C" {

// Parse an OBJ file. Returns a handle (>=0) or -1 on failure.
// Supports v / f records, polygon fan triangulation, and f v/vt/vn forms.
int32_t mesh_load_obj(const char* path) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  auto* m = new Mesh();
  char line[1024];
  std::vector<int32_t> poly;
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && std::isspace(line[1])) {
      float x, y, z;
      if (std::sscanf(line + 1, "%f %f %f", &x, &y, &z) == 3) {
        m->verts.push_back(x);
        m->verts.push_back(y);
        m->verts.push_back(z);
      }
    } else if (line[0] == 'f' && std::isspace(line[1])) {
      poly.clear();
      const char* p = line + 1;
      while (*p) {
        while (*p && std::isspace(*p)) ++p;
        if (!*p) break;
        long idx = std::strtol(p, const_cast<char**>(&p), 10);
        if (idx < 0) idx = (long)(m->verts.size() / 3) + idx + 1;
        if (idx > 0) poly.push_back((int32_t)(idx - 1));
        while (*p && !std::isspace(*p)) ++p;  // skip /vt/vn part
      }
      for (size_t k = 1; k + 1 < poly.size(); ++k) {
        m->faces.push_back(poly[0]);
        m->faces.push_back(poly[k]);
        m->faces.push_back(poly[k + 1]);
      }
    }
  }
  std::fclose(f);
  g_meshes.push_back(m);
  return (int32_t)g_meshes.size() - 1;
}

int64_t mesh_num_verts(int32_t h) {
  return (int64_t)g_meshes[h]->verts.size() / 3;
}
int64_t mesh_num_faces(int32_t h) {
  return (int64_t)g_meshes[h]->faces.size() / 3;
}
void mesh_get_verts(int32_t h, float* out) {
  std::memcpy(out, g_meshes[h]->verts.data(),
              g_meshes[h]->verts.size() * sizeof(float));
}
void mesh_get_faces(int32_t h, int32_t* out) {
  std::memcpy(out, g_meshes[h]->faces.data(),
              g_meshes[h]->faces.size() * sizeof(int32_t));
}
void mesh_free(int32_t h) {
  delete g_meshes[h];
  g_meshes[h] = nullptr;
}

// Bin triangles into a uniform grid by AABB overlap (+margin).
// tris: v0,v1,v2 as (n,3) float arrays. table: (ncells*cap) int32, -1 = empty.
// Returns the max triangles-per-cell encountered (for capacity checks).
int32_t mesh_bin_triangles(const float* v0, const float* v1, const float* v2,
                           int64_t n_tris, const float* origin, float cell,
                           int32_t nx, int32_t ny, int32_t nz, float margin,
                           int32_t cap, int32_t* table) {
  const int64_t ncells = (int64_t)nx * ny * nz;
  std::vector<int32_t> counts(ncells, 0);
  for (int64_t c = 0; c < ncells * cap; ++c) table[c] = -1;
  int32_t maxc = 0;
  auto clampi = [](int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  };
  for (int64_t t = 0; t < n_tris; ++t) {
    float lo[3], hi[3];
    for (int a = 0; a < 3; ++a) {
      float x0 = v0[t * 3 + a], x1 = v1[t * 3 + a], x2 = v2[t * 3 + a];
      lo[a] = std::fmin(x0, std::fmin(x1, x2)) - margin;
      hi[a] = std::fmax(x0, std::fmax(x1, x2)) + margin;
    }
    int ilo[3], ihi[3];
    const int dims[3] = {nx, ny, nz};
    for (int a = 0; a < 3; ++a) {
      ilo[a] = clampi((int)std::floor((lo[a] - origin[a]) / cell), 0,
                      dims[a] - 1);
      ihi[a] = clampi((int)std::floor((hi[a] - origin[a]) / cell), 0,
                      dims[a] - 1);
    }
    for (int i = ilo[0]; i <= ihi[0]; ++i)
      for (int j = ilo[1]; j <= ihi[1]; ++j)
        for (int k = ilo[2]; k <= ihi[2]; ++k) {
          int64_t c = ((int64_t)i * ny + j) * nz + k;
          int32_t& cnt = counts[c];
          if (cnt < cap) table[c * cap + cnt] = (int32_t)t;
          ++cnt;
          if (cnt > maxc) maxc = cnt;
        }
  }
  return maxc;
}

// Weld duplicate vertices within tolerance (hash grid); returns new count.
int64_t mesh_weld_vertices(float* verts, int64_t n, int32_t* faces,
                           int64_t n_faces, float tol) {
  std::vector<int64_t> remap(n);
  std::vector<float> out;
  out.reserve(n * 3);
  // simple O(n log n) via sorted keys
  struct Key {
    int64_t qx, qy, qz, idx;
  };
  std::vector<Key> keys(n);
  const float inv = tol > 0 ? 1.0f / tol : 1e9f;
  for (int64_t i = 0; i < n; ++i) {
    keys[i] = {(int64_t)std::llround(verts[i * 3] * inv),
               (int64_t)std::llround(verts[i * 3 + 1] * inv),
               (int64_t)std::llround(verts[i * 3 + 2] * inv), i};
  }
  std::qsort(keys.data(), n, sizeof(Key), [](const void* a, const void* b) {
    const Key* ka = (const Key*)a;
    const Key* kb = (const Key*)b;
    if (ka->qx != kb->qx) return ka->qx < kb->qx ? -1 : 1;
    if (ka->qy != kb->qy) return ka->qy < kb->qy ? -1 : 1;
    if (ka->qz != kb->qz) return ka->qz < kb->qz ? -1 : 1;
    return 0;
  });
  int64_t n_out = 0;
  for (int64_t i = 0; i < n;) {
    int64_t j = i;
    while (j < n && keys[j].qx == keys[i].qx && keys[j].qy == keys[i].qy &&
           keys[j].qz == keys[i].qz)
      ++j;
    const int64_t src = keys[i].idx;
    out.push_back(verts[src * 3]);
    out.push_back(verts[src * 3 + 1]);
    out.push_back(verts[src * 3 + 2]);
    for (int64_t k = i; k < j; ++k) remap[keys[k].idx] = n_out;
    ++n_out;
    i = j;
  }
  std::memcpy(verts, out.data(), out.size() * sizeof(float));
  for (int64_t i = 0; i < n_faces * 3; ++i)
    faces[i] = (int32_t)remap[faces[i]];
  return n_out;
}

// Sample BCE markers over the triangle surface at `spacing`, with `layers`
// sheets offset into the solid along the inward face normal (the role of the
// reference's ChFsiProblemSPH mesh-BCE construction, ChFsiProblemSPH.cpp).
// Writes up to `cap` xyz triplets into `out`; returns the number generated
// (callers re-invoke with a larger buffer if the return exceeds `cap`).
int64_t mesh_surface_markers(const float* verts, int64_t n_verts,
                             const int32_t* faces, int64_t n_faces,
                             float spacing, int32_t layers,
                             float* out, int64_t cap) {
  (void)n_verts;
  int64_t count = 0;
  for (int64_t f = 0; f < n_faces; ++f) {
    const float* a = verts + 3 * faces[3 * f + 0];
    const float* b = verts + 3 * faces[3 * f + 1];
    const float* c = verts + 3 * faces[3 * f + 2];
    float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    float e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    float nrm[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                    e1[2] * e2[0] - e1[0] * e2[2],
                    e1[0] * e2[1] - e1[1] * e2[0]};
    float nl = std::sqrt(nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2]);
    if (nl < 1e-12f) continue;
    for (int k = 0; k < 3; ++k) nrm[k] /= nl;
    float l1 = std::sqrt(e1[0] * e1[0] + e1[1] * e1[1] + e1[2] * e1[2]);
    float l2 = std::sqrt(e2[0] * e2[0] + e2[1] * e2[1] + e2[2] * e2[2]);
    int nu = (int)std::ceil(l1 / spacing);
    int nv = (int)std::ceil(l2 / spacing);
    if (nu < 1) nu = 1;
    if (nv < 1) nv = 1;
    for (int i = 0; i < nu; ++i) {
      for (int j = 0; j < nv; ++j) {
        float u = (i + 0.5f) / nu;
        float v = (j + 0.5f) / nv;
        if (u + v > 1.0f) continue;  // stay inside the triangle
        for (int L = 0; L < layers; ++L) {
          if (count < cap) {
            float off = spacing * L;
            out[3 * count + 0] = a[0] + u * e1[0] + v * e2[0] - off * nrm[0];
            out[3 * count + 1] = a[1] + u * e1[1] + v * e2[1] - off * nrm[1];
            out[3 * count + 2] = a[2] + u * e1[2] + v * e2[2] - off * nrm[2];
          }
          ++count;
        }
      }
    }
  }
  return count;
}

}  // extern "C"

