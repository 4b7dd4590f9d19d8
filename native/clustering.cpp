// Greedy agglomerative pose clustering — native runtime component.
//
// The reference's CPU clustering mode is native C++
// (src/transformation_clustering.cpp:62-137, PCL-derived): sort candidate
// poses by votes descending, assign each pose to the first cluster whose
// seed is within (trans_thresh, rot_thresh), sum votes, then average the
// top clusters' translations and quaternions (Gramkow). This is the
// rebuild's native equivalent (C ABI for ctypes); the NumPy implementation
// in ops/clustering.py is the readable twin used in tests.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct Quat { double w, x, y, z; };

Quat mat_to_quat(const float* T) {
    // row-major 4x4; returns normalized (w,x,y,z)
    double r00 = T[0], r01 = T[1], r02 = T[2];
    double r10 = T[4], r11 = T[5], r12 = T[6];
    double r20 = T[8], r21 = T[9], r22 = T[10];
    double tr = r00 + r11 + r22;
    Quat q;
    q.w = 0.5 * std::sqrt(std::max(1.0 + tr, 0.0));
    q.x = std::copysign(0.5 * std::sqrt(std::max(1 + r00 - r11 - r22, 0.0)),
                        r21 - r12);
    q.y = std::copysign(0.5 * std::sqrt(std::max(1 - r00 + r11 - r22, 0.0)),
                        r02 - r20);
    q.z = std::copysign(0.5 * std::sqrt(std::max(1 - r00 - r11 + r22, 0.0)),
                        r10 - r01);
    double n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
    if (n > 0) { q.w /= n; q.x /= n; q.y /= n; q.z /= n; }
    return q;
}

double rot_angle_between(const float* A, const float* B) {
    // |angle(A[:3,:3]^T B[:3,:3])| via trace(A^T B)
    double tr = 0;
    for (int i = 0; i < 3; i++)
        for (int k = 0; k < 3; k++)
            tr += (double)A[k * 4 + i] * (double)B[k * 4 + i];
    double c = (tr - 1.0) / 2.0;
    c = std::min(1.0, std::max(-1.0, c));
    return std::fabs(std::acos(c));
}

}  // namespace

extern "C" {

// poses: P x 16 row-major 4x4 floats. votes: P floats.
// out_poses: max_clusters x 16 floats. out_votes: max_clusters floats.
// Returns the number of clusters written (<= max_clusters).
int osn_cluster_poses_greedy(const float* poses, const float* votes, long P,
                             float trans_thresh, float rot_thresh,
                             int max_clusters, float* out_poses,
                             float* out_votes) {
    std::vector<long> order(P);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](long a, long b) { return votes[a] > votes[b]; });

    std::vector<long> seeds;
    std::vector<std::vector<long>> members;
    std::vector<double> cluster_votes;

    for (long oi = 0; oi < P; oi++) {
        long i = order[oi];
        const float* Ti = poses + 16 * i;
        bool placed = false;
        for (size_t c = 0; c < seeds.size(); c++) {
            const float* Ts = poses + 16 * seeds[c];
            double dx = Ts[3] - Ti[3];
            double dy = Ts[7] - Ti[7];
            double dz = Ts[11] - Ti[11];
            double td = std::sqrt(dx * dx + dy * dy + dz * dz);
            if (td < trans_thresh &&
                rot_angle_between(Ts, Ti) < rot_thresh) {
                members[c].push_back(i);
                cluster_votes[c] += votes[i];
                placed = true;
                break;
            }
        }
        if (!placed) {
            seeds.push_back(i);
            members.push_back({i});
            cluster_votes.push_back(votes[i]);
        }
    }

    std::vector<size_t> corder(seeds.size());
    std::iota(corder.begin(), corder.end(), 0);
    std::stable_sort(corder.begin(), corder.end(), [&](size_t a, size_t b) {
        return cluster_votes[a] > cluster_votes[b];
    });

    int k = (int)std::min((size_t)max_clusters, seeds.size());
    for (int ci = 0; ci < k; ci++) {
        size_t c = corder[ci];
        double tx = 0, ty = 0, tz = 0;
        Quat qa{0, 0, 0, 0};
        for (long m : members[c]) {
            const float* T = poses + 16 * m;
            tx += T[3]; ty += T[7]; tz += T[11];
            Quat q = mat_to_quat(T);
            qa.w += q.w; qa.x += q.x; qa.y += q.y; qa.z += q.z;
        }
        double cnt = (double)members[c].size();
        tx /= cnt; ty /= cnt; tz /= cnt;
        double n = std::sqrt(qa.w * qa.w + qa.x * qa.x + qa.y * qa.y +
                             qa.z * qa.z);
        if (n > 0) { qa.w /= n; qa.x /= n; qa.y /= n; qa.z /= n; }
        float* O = out_poses + 16 * ci;
        double w = qa.w, x = qa.x, y = qa.y, z = qa.z;
        O[0] = (float)(1 - 2 * (y * y + z * z));
        O[1] = (float)(2 * (x * y - w * z));
        O[2] = (float)(2 * (x * z + w * y));
        O[3] = (float)tx;
        O[4] = (float)(2 * (x * y + w * z));
        O[5] = (float)(1 - 2 * (x * x + z * z));
        O[6] = (float)(2 * (y * z - w * x));
        O[7] = (float)ty;
        O[8] = (float)(2 * (x * z - w * y));
        O[9] = (float)(2 * (y * z + w * x));
        O[10] = (float)(1 - 2 * (x * x + y * y));
        O[11] = (float)tz;
        O[12] = O[13] = O[14] = 0.0f;
        O[15] = 1.0f;
        out_votes[ci] = (float)cluster_votes[c];
    }
    return k;
}

}  // extern "C"
