// Native single-scale Haar-cascade evaluator (serving's host hot spot).
//
// The Python HaarCascade (mmer_tpu/preprocess/cascade.py) parses the
// OpenCV XML and vectorizes the sliding-window evaluation with numpy —
// ~67 ms/frame at 300×256 on this host, which dominates serving latency
// (engine.infer_video_file step 1).  This evaluator runs the identical
// semantics as tight cache-friendly loops: per window, variance
// normalization over the 1-px-inset rect, raw-sum stump test
// `feat < thresh · vnorm`, per-stage early rejection.  The scale pyramid,
// rectangle grouping and all parsing stay in Python; Python hands one
// scaled float64 gray image per call and receives surviving window
// origins.
//
// Evaluation order matches the numpy path (3 fixed rect terms per
// feature, sequential stage sums) so detections agree; float32 vs float64
// accumulation of stage sums can flip exactly-borderline windows, which
// the equivalence test tolerates via IoU matching.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FeatRect {
    int x, y, w, h;
    double weight;
};

struct Context {
    int win_w = 0, win_h = 0;
    std::vector<int> stage_off;        // n_stages + 1 prefix offsets
    std::vector<double> stage_thr;     // n_stages
    std::vector<int> feat_idx;         // n_weak_total
    std::vector<double> node_thr, left_val, right_val;
    std::vector<FeatRect> rects;       // 3 per feature
};

inline double rect_sum(const double* sat, int stride, int x, int y,
                       int w, int h) {
    return sat[(y + h) * stride + x + w] - sat[y * stride + x + w]
         - sat[(y + h) * stride + x] + sat[y * stride + x];
}

}  // namespace

extern "C" {

void* cascade_create(int win_w, int win_h, int n_stages,
                     const int* stage_offsets,
                     const double* stage_thresholds,
                     const int* feature_idx,
                     const double* node_thresh,
                     const double* left_val,
                     const double* right_val,
                     int n_weak_total,
                     int n_features,
                     const double* features /* (n_features, 3, 5) */) {
    auto* ctx = new Context();
    ctx->win_w = win_w;
    ctx->win_h = win_h;
    ctx->stage_off.assign(stage_offsets, stage_offsets + n_stages + 1);
    ctx->stage_thr.assign(stage_thresholds, stage_thresholds + n_stages);
    ctx->feat_idx.assign(feature_idx, feature_idx + n_weak_total);
    ctx->node_thr.assign(node_thresh, node_thresh + n_weak_total);
    ctx->left_val.assign(left_val, left_val + n_weak_total);
    ctx->right_val.assign(right_val, right_val + n_weak_total);
    ctx->rects.resize(static_cast<size_t>(n_features) * 3);
    for (int f = 0; f < n_features; ++f) {
        for (int k = 0; k < 3; ++k) {
            const double* r = features + (static_cast<size_t>(f) * 3 + k) * 5;
            ctx->rects[static_cast<size_t>(f) * 3 + k] = FeatRect{
                static_cast<int>(r[0]), static_cast<int>(r[1]),
                static_cast<int>(r[2]), static_cast<int>(r[3]), r[4]};
        }
    }
    return ctx;
}

void cascade_destroy(void* p) { delete static_cast<Context*>(p); }

// img: (h, w) float64 grayscale (same values the numpy path resizes to).
// Fills out_xy with surviving (x, y) origin pairs; returns the count
// (clamped to max_out pairs).
int cascade_detect_scaled(const void* p, const double* img, int h, int w,
                          int stride_step, int* out_xy, int max_out) {
    const auto* ctx = static_cast<const Context*>(p);
    const int win_w = ctx->win_w, win_h = ctx->win_h;
    const int hh = h - win_h, ww = w - win_w;
    if (hh <= 0 || ww <= 0) return 0;

    // Integral images with a zero top row/left column, like the numpy
    // path's (H+1, W+1) layout.
    const int sw = w + 1;
    std::vector<double> sat(static_cast<size_t>(h + 1) * sw, 0.0);
    std::vector<double> sat2(static_cast<size_t>(h + 1) * sw, 0.0);
    for (int y = 0; y < h; ++y) {
        double row = 0.0, row2 = 0.0;
        const double* src = img + static_cast<size_t>(y) * w;
        double* s = sat.data() + static_cast<size_t>(y + 1) * sw;
        double* s2 = sat2.data() + static_cast<size_t>(y + 1) * sw;
        const double* su = sat.data() + static_cast<size_t>(y) * sw;
        const double* s2u = sat2.data() + static_cast<size_t>(y) * sw;
        for (int x = 0; x < w; ++x) {
            row += src[x];
            row2 += src[x] * src[x];
            s[x + 1] = su[x + 1] + row;
            s2[x + 1] = s2u[x + 1] + row2;
        }
    }

    const double norm_area =
        static_cast<double>(win_w - 2) * (win_h - 2);
    const int n_stages = static_cast<int>(ctx->stage_thr.size());
    int count = 0;

    for (int y = 0; y < hh; y += stride_step) {
        for (int x = 0; x < ww; x += stride_step) {
            const double total = rect_sum(sat.data(), sw, x + 1, y + 1,
                                          win_w - 2, win_h - 2);
            const double sq = rect_sum(sat2.data(), sw, x + 1, y + 1,
                                       win_w - 2, win_h - 2);
            const double nf = norm_area * sq - total * total;
            const double vnorm = nf > 0.0 ? std::sqrt(nf) : 1.0;

            bool alive = true;
            for (int s = 0; s < n_stages && alive; ++s) {
                double stage_sum = 0.0;
                for (int wk = ctx->stage_off[s]; wk < ctx->stage_off[s + 1];
                     ++wk) {
                    const FeatRect* fr =
                        &ctx->rects[static_cast<size_t>(ctx->feat_idx[wk])
                                    * 3];
                    double feat = 0.0;
                    for (int k = 0; k < 3; ++k) {
                        const FeatRect& r = fr[k];
                        if (r.weight == 0.0) continue;
                        feat += r.weight * rect_sum(sat.data(), sw,
                                                    x + r.x, y + r.y,
                                                    r.w, r.h);
                    }
                    stage_sum += feat < ctx->node_thr[wk] * vnorm
                                     ? ctx->left_val[wk]
                                     : ctx->right_val[wk];
                }
                alive = stage_sum >= ctx->stage_thr[s];
            }
            if (alive && count < max_out) {
                out_xy[2 * count] = x;
                out_xy[2 * count + 1] = y;
                ++count;
            }
        }
    }
    return count;
}

}  // extern "C"
