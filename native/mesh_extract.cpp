// Iso-surface extraction (marching tetrahedra) for density volumes.
//
// Role of the reference's skimage.measure.marching_cubes call
// (_util/eg3d_metrics3d.py:186-210): density grid -> triangle mesh at a
// level set. Marching tetrahedra (6 tets per cube) gives a watertight
// surface with tiny exact case tables; vertices are deduplicated per grid
// edge so the mesh is indexed. Built by panic3d_tpu.runtime.native_ops
// (g++ -O3 -shared) and called through ctypes.
//
// Grid layout: values[x*ny*nz + y*nz + z], vertex coords returned in
// (x, y, z) index units (caller rescales to world units).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct MeshBuf {
    std::vector<float> verts;
    std::vector<int32_t> tris;
    std::unordered_map<uint64_t, int32_t> edge_cache;
};

// cube corner offsets, index c = (dx<<2)|(dy<<1)|dz
static const int CDX[8] = {0, 0, 0, 0, 1, 1, 1, 1};
static const int CDY[8] = {0, 0, 1, 1, 0, 0, 1, 1};
static const int CDZ[8] = {0, 1, 0, 1, 0, 1, 0, 1};

// six tetrahedra covering the cube, all sharing diagonal c0-c7
static const int TETS[6][4] = {
    {0, 4, 5, 7}, {0, 5, 1, 7}, {0, 1, 3, 7},
    {0, 3, 2, 7}, {0, 2, 6, 7}, {0, 6, 4, 7},
};

// tet edge list: pairs of local tet-vertex indices
static const int TET_EDGES[6][2] = {
    {0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3},
};

// triangle table per 4-bit sign case; entries are tet-edge ids, -1 = end
static const int TET_TRIS[16][7] = {
    {-1, -1, -1, -1, -1, -1, -1},            // 0000
    {0, 1, 2, -1, -1, -1, -1},               // 0001: v0
    {0, 4, 3, -1, -1, -1, -1},               // 0010: v1
    {1, 2, 4, 1, 4, 3, -1},                  // 0011: v0 v1
    {1, 3, 5, -1, -1, -1, -1},               // 0100: v2
    {0, 3, 5, 0, 5, 2, -1},                  // 0101: v0 v2
    {0, 4, 5, 0, 5, 1, -1},                  // 0110: v1 v2
    {2, 4, 5, -1, -1, -1, -1},               // 0111: v0 v1 v2
    {2, 5, 4, -1, -1, -1, -1},               // 1000: v3
    {0, 5, 4, 0, 1, 5, -1},                  // 1001
    {0, 5, 3, 0, 2, 5, -1},                  // 1010
    {1, 5, 3, -1, -1, -1, -1},               // 1011
    {1, 4, 2, 1, 3, 4, -1},                  // 1100
    {0, 3, 4, -1, -1, -1, -1},               // 1101
    {0, 2, 1, -1, -1, -1, -1},               // 1110
    {-1, -1, -1, -1, -1, -1, -1},            // 1111
};

static inline int32_t edge_vertex(
    MeshBuf& mb, const float* grid, float level,
    int64_t ga, int64_t gb,  // global linear ids of the two endpoints
    float ax, float ay, float az, float bx, float by, float bz,
    float fa, float fb) {
    uint64_t key = ga < gb
        ? (uint64_t(ga) << 32) | uint64_t(gb)
        : (uint64_t(gb) << 32) | uint64_t(ga);
    auto it = mb.edge_cache.find(key);
    if (it != mb.edge_cache.end()) return it->second;
    float denom = fb - fa;
    float t = denom != 0.0f ? (level - fa) / denom : 0.5f;
    if (t < 0.0f) t = 0.0f;
    if (t > 1.0f) t = 1.0f;
    int32_t idx = int32_t(mb.verts.size() / 3);
    mb.verts.push_back(ax + t * (bx - ax));
    mb.verts.push_back(ay + t * (by - ay));
    mb.verts.push_back(az + t * (bz - az));
    mb.edge_cache.emplace(key, idx);
    return idx;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees *out_verts / *out_tris with mt_free.
int marching_tetrahedra(
    const float* grid, int nx, int ny, int nz, float level,
    float** out_verts, int64_t* n_verts,
    int32_t** out_tris, int64_t* n_tris) {
    MeshBuf mb;
    mb.verts.reserve(1 << 20);
    mb.tris.reserve(1 << 20);

    const int64_t syz = int64_t(ny) * nz;
    for (int x = 0; x + 1 < nx; ++x) {
        for (int y = 0; y + 1 < ny; ++y) {
            const float* col0 = grid + int64_t(x) * syz + int64_t(y) * nz;
            for (int z = 0; z + 1 < nz; ++z) {
                // fast reject: all 8 corners same side
                float c[8];
                int above = 0;
                for (int i = 0; i < 8; ++i) {
                    c[i] = grid[int64_t(x + CDX[i]) * syz
                                + int64_t(y + CDY[i]) * nz + (z + CDZ[i])];
                    above += (c[i] > level);
                }
                if (above == 0 || above == 8) continue;
                (void)col0;

                for (int t = 0; t < 6; ++t) {
                    const int* tv = TETS[t];
                    int caseid = 0;
                    for (int i = 0; i < 4; ++i)
                        if (c[tv[i]] > level) caseid |= (1 << i);
                    const int* tri = TET_TRIS[caseid];
                    if (tri[0] < 0) continue;
                    int32_t vid[6];
                    for (int e = 0; e < 6; ++e) vid[e] = -1;
                    for (int k = 0; tri[k] >= 0; k += 3) {
                        for (int j = 0; j < 3; ++j) {
                            int e = tri[k + j];
                            if (vid[e] < 0) {
                                int a = tv[TET_EDGES[e][0]];
                                int b = tv[TET_EDGES[e][1]];
                                int ax_ = x + CDX[a], ay_ = y + CDY[a], az_ = z + CDZ[a];
                                int bx_ = x + CDX[b], by_ = y + CDY[b], bz_ = z + CDZ[b];
                                int64_t ga = int64_t(ax_) * syz + int64_t(ay_) * nz + az_;
                                int64_t gb = int64_t(bx_) * syz + int64_t(by_) * nz + bz_;
                                vid[e] = edge_vertex(
                                    mb, grid, level, ga, gb,
                                    float(ax_), float(ay_), float(az_),
                                    float(bx_), float(by_), float(bz_),
                                    c[a], c[b]);
                            }
                            mb.tris.push_back(vid[e]);
                        }
                    }
                }
            }
        }
    }

    *n_verts = int64_t(mb.verts.size() / 3);
    *n_tris = int64_t(mb.tris.size() / 3);
    *out_verts = (float*)std::malloc(mb.verts.size() * sizeof(float));
    *out_tris = (int32_t*)std::malloc(mb.tris.size() * sizeof(int32_t));
    if (!*out_verts || !*out_tris) return 1;
    std::memcpy(*out_verts, mb.verts.data(), mb.verts.size() * sizeof(float));
    std::memcpy(*out_tris, mb.tris.data(), mb.tris.size() * sizeof(int32_t));
    return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
