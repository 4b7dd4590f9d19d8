// Standalone native voxel-grid downsampler binary.
//
// Native equivalent of the reference's voxel_grid CLI
// (pcl/voxel_grid/voxel_grid.cpp:6-31): PLY in -> voxel centroid filter ->
// PLY out. Default leaf 0.01 matches the reference.
//
// Usage: osn_voxel_grid <in.ply> <out.ply> [leaf]

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <unordered_map>
#include <vector>

extern "C" {
int osn_ply_read(const char*, float**, float**, long*);
int osn_ply_write(const char*, const float*, const float*, long);
void osn_free(float*);
}

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s <in.ply> <out.ply> [leaf=0.01]\n",
                     argv[0]);
        return 2;
    }
    float leaf = argc > 3 ? std::atof(argv[3]) : 0.01f;

    float *pts = nullptr, *nrm = nullptr;
    long n = 0;
    int rc = osn_ply_read(argv[1], &pts, &nrm, &n);
    if (rc) {
        std::fprintf(stderr, "error reading %s (code %d)\n", argv[1], rc);
        return 1;
    }
    std::printf("Loaded %ld points from %s\n", n, argv[1]);

    float lo[3] = {1e30f, 1e30f, 1e30f};
    for (long i = 0; i < n; i++)
        for (int c = 0; c < 3; c++)
            lo[c] = std::min(lo[c], pts[3 * i + c]);

    struct Acc { double p[3] = {0, 0, 0}, nn[3] = {0, 0, 0}; long c = 0; };
    std::unordered_map<uint64_t, Acc> cells;
    cells.reserve(n / 4);
    for (long i = 0; i < n; i++) {
        uint64_t key = 0;
        for (int c = 0; c < 3; c++) {
            uint64_t b = (uint64_t)std::floor(
                (pts[3 * i + c] - lo[c]) / leaf);
            key = key * 2097169ull + b;  // prime-mix linearization
        }
        Acc& a = cells[key];
        for (int c = 0; c < 3; c++) {
            a.p[c] += pts[3 * i + c];
            if (nrm) a.nn[c] += nrm[3 * i + c];
        }
        a.c++;
    }

    std::vector<float> out_p, out_n;
    out_p.reserve(cells.size() * 3);
    if (nrm) out_n.reserve(cells.size() * 3);
    for (const auto& kv : cells) {
        const Acc& a = kv.second;
        for (int c = 0; c < 3; c++)
            out_p.push_back((float)(a.p[c] / a.c));
        if (nrm)
            for (int c = 0; c < 3; c++)
                out_n.push_back((float)(a.nn[c] / a.c));
    }
    long m = (long)cells.size();
    rc = osn_ply_write(argv[2], out_p.data(),
                       nrm ? out_n.data() : nullptr, m);
    if (rc) {
        std::fprintf(stderr, "error writing %s (code %d)\n", argv[2], rc);
        return 1;
    }
    std::printf("Wrote %ld points to %s\n", m, argv[2]);
    osn_free(pts);
    osn_free(nrm);
    return 0;
}
