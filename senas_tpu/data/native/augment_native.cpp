// Native host-side data-pipeline kernels (C++, ctypes ABI).
//
// The reference delegates these to third-party C++ cores (SimpleITK's
// CurvatureFlow, promise12.py:269/augmentation.py:428-442; cv2.remap for
// elastic deformation, augmentation.py:376-425). This framework carries its
// own implementations so the host pipeline keeps up with TPU step rates
// without those wheels. Exposed as a plain C ABI for ctypes (no pybind11 in
// this image).
//
// Build: python -m senas_tpu.data.native.build   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Curvature-flow denoising: dI/dt = kappa * |grad I| with central-difference
// curvature, edge-replicated boundary. In-place over a [h, w] float64 image.
void curvature_flow(double* u, int h, int w, double t_step, int n_iter) {
    const double eps = 1e-8;
    std::vector<double> next(static_cast<size_t>(h) * w);
    auto at = [&](const double* buf, int y, int x) {
        y = std::min(std::max(y, 0), h - 1);
        x = std::min(std::max(x, 0), w - 1);
        return buf[static_cast<size_t>(y) * w + x];
    };
    for (int it = 0; it < n_iter; ++it) {
        for (int y = 0; y < h; ++y) {
            for (int x = 0; x < w; ++x) {
                const double c = at(u, y, x);
                const double xm = at(u, y, x - 1), xp = at(u, y, x + 1);
                const double ym = at(u, y - 1, x), yp = at(u, y + 1, x);
                const double ux = (xp - xm) / 2.0;
                const double uy = (yp - ym) / 2.0;
                const double uxx = xp - 2.0 * c + xm;
                const double uyy = yp - 2.0 * c + ym;
                const double uxy = (at(u, y + 1, x + 1) - at(u, y + 1, x - 1)
                                    - at(u, y - 1, x + 1) + at(u, y - 1, x - 1))
                                   / 4.0;
                const double num = uxx * uy * uy - 2.0 * ux * uy * uxy
                                   + uyy * ux * ux;
                const double den = ux * ux + uy * uy + eps;
                next[static_cast<size_t>(y) * w + x] = c + t_step * num / den;
            }
        }
        std::memcpy(u, next.data(), sizeof(double) * next.size());
    }
}

// Separable Gaussian blur of a [h, w] float32 field (reflect-101 border,
// matching cv2.GaussianBlur defaults), kernel radius = (ksize-1)/2.
void gaussian_blur_f32(const float* src, float* dst, int h, int w,
                       float sigma, int ksize) {
    const int r = ksize / 2;
    std::vector<float> kern(ksize);
    float sum = 0.f;
    for (int i = 0; i < ksize; ++i) {
        const float d = static_cast<float>(i - r);
        kern[i] = std::exp(-d * d / (2.f * sigma * sigma));
        sum += kern[i];
    }
    for (int i = 0; i < ksize; ++i) kern[i] /= sum;

    auto reflect = [](int v, int n) {  // BORDER_REFLECT_101
        if (n == 1) return 0;
        while (v < 0 || v >= n) {
            if (v < 0) v = -v;
            if (v >= n) v = 2 * n - 2 - v;
        }
        return v;
    };

    std::vector<float> tmp(static_cast<size_t>(h) * w);
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            float acc = 0.f;
            for (int k = 0; k < ksize; ++k)
                acc += kern[k] * src[static_cast<size_t>(y) * w
                                     + reflect(x + k - r, w)];
            tmp[static_cast<size_t>(y) * w + x] = acc;
        }
    }
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            float acc = 0.f;
            for (int k = 0; k < ksize; ++k)
                acc += kern[k] * tmp[static_cast<size_t>(reflect(y + k - r, h))
                                     * w + x];
            dst[static_cast<size_t>(y) * w + x] = acc;
        }
    }
}

// Elastic remap: sample img (bilinear) and mask (nearest) at
// (y + dy, x + dx), zero outside — cv2.remap BORDER_CONSTANT semantics.
void elastic_remap(const float* img, const uint8_t* mask,
                   const float* dy, const float* dx,
                   float* img_out, uint8_t* mask_out, int h, int w) {
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            const size_t i = static_cast<size_t>(y) * w + x;
            const float sy = static_cast<float>(y) + dy[i];
            const float sx = static_cast<float>(x) + dx[i];
            // bilinear for the image
            const int y0 = static_cast<int>(std::floor(sy));
            const int x0 = static_cast<int>(std::floor(sx));
            const float fy = sy - y0, fx = sx - x0;
            float acc = 0.f;
            for (int oy = 0; oy <= 1; ++oy) {
                for (int ox = 0; ox <= 1; ++ox) {
                    const int yy = y0 + oy, xx = x0 + ox;
                    if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
                    const float wgt = (oy ? fy : 1.f - fy) * (ox ? fx : 1.f - fx);
                    acc += wgt * img[static_cast<size_t>(yy) * w + xx];
                }
            }
            img_out[i] = acc;
            // nearest for the mask
            const int ny = static_cast<int>(std::lround(sy));
            const int nx = static_cast<int>(std::lround(sx));
            mask_out[i] = (ny < 0 || ny >= h || nx < 0 || nx >= w)
                              ? 0 : mask[static_cast<size_t>(ny) * w + nx];
        }
    }
}

}  // extern "C"
