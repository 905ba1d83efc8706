// Host-side data-pipeline kernels (C++), the native runtime component of
// glenet_tpu: the TPU compute path is XLA/Pallas, but the per-sample host
// pipeline (gt-sampling collision tests, point-in-box masks for
// augmentation and database creation) runs on a single CPU core — these
// loops are the host hot path the reference covers with numba JITs
// (pcdet/datasets/augmentor/augmentor_utils.py) and CUDA CPU mirrors
// (pcdet/ops/roiaware_pool3d points_in_boxes_cpu).
//
// Exposed through ctypes (glenet_tpu/ops/host_ops.py) with a pure-numpy
// fallback when the shared library has not been built.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>

extern "C" {

// points (N,3) row-major, boxes (M,7) [x y z dx dy dz heading]
// out (N,M) uint8: 1 if point inside rotated box (z within dz/2, xy exact)
void points_in_rboxes(const float* points, int64_t n,
                      const float* boxes, int64_t m,
                      uint8_t* out) {
    for (int64_t j = 0; j < m; ++j) {
        const float* b = boxes + j * 7;
        const float cx = b[0], cy = b[1], cz = b[2];
        const float hx = b[3] * 0.5f, hy = b[4] * 0.5f, hz = b[5] * 0.5f;
        const float ca = std::cos(-b[6]), sa = std::sin(-b[6]);
        for (int64_t i = 0; i < n; ++i) {
            const float* p = points + i * 3;
            const float dz = p[2] - cz;
            uint8_t in = 0;
            if (std::fabs(dz) <= hz) {
                const float dx = p[0] - cx, dy = p[1] - cy;
                const float lx = dx * ca - dy * sa;
                const float ly = dx * sa + dy * ca;
                in = (std::fabs(lx) <= hx) & (std::fabs(ly) <= hy);
            }
            out[i * m + j] = in;
        }
    }
}

// BEV corner computation for one box into c[8] = (x0,y0,...,x3,y3)
static inline void bev_corners(const float* b, float* c) {
    const float hx = b[3] * 0.5f, hy = b[4] * 0.5f;
    const float ca = std::cos(b[6]), sa = std::sin(b[6]);
    const float dx[4] = {hx, hx, -hx, -hx};
    const float dy[4] = {hy, -hy, -hy, hy};
    for (int k = 0; k < 4; ++k) {
        c[2 * k] = dx[k] * ca - dy[k] * sa + b[0];
        c[2 * k + 1] = dx[k] * sa + dy[k] * ca + b[1];
    }
}

// SAT overlap test of two convex quads given as 4 (x, y) corners each
static inline bool sat_overlap(const float* a, const float* b) {
    const float* quads[2] = {a, b};
    for (int q = 0; q < 2; ++q) {
        const float* c = quads[q];
        for (int e = 0; e < 4; ++e) {
            const float ex = c[2 * ((e + 1) % 4)] - c[2 * e];
            const float ey = c[2 * ((e + 1) % 4) + 1] - c[2 * e + 1];
            const float nx = -ey, ny = ex;
            float amin = 1e30f, amax = -1e30f, bmin = 1e30f, bmax = -1e30f;
            for (int k = 0; k < 4; ++k) {
                const float pa = a[2 * k] * nx + a[2 * k + 1] * ny;
                const float pb = b[2 * k] * nx + b[2 * k + 1] * ny;
                amin = pa < amin ? pa : amin;
                amax = pa > amax ? pa : amax;
                bmin = pb < bmin ? pb : bmin;
                bmax = pb > bmax ? pb : bmax;
            }
            if (amax < bmin || bmax < amin) return false;
        }
    }
    return true;
}

// boxes_a (A,7) x boxes_b (B,7) -> out (A,B) uint8 BEV rectangle collision
void rbox_collision(const float* boxes_a, int64_t na,
                    const float* boxes_b, int64_t nb,
                    uint8_t* out) {
    float ca[8], cb[8];
    for (int64_t i = 0; i < na; ++i) {
        bev_corners(boxes_a + i * 7, ca);
        for (int64_t j = 0; j < nb; ++j) {
            bev_corners(boxes_b + j * 7, cb);
            out[i * nb + j] = sat_overlap(ca, cb) ? 1 : 0;
        }
    }
}

}  // extern "C"
