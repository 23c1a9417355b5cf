// Native runtime helpers for satellite_approximation_tpu.
//
// The reference implementation is C++ end-to-end; here native code backs the
// host-side (non-TPU) hot paths that don't map onto XLA:
//  * hole_fill      — the sequential inverse-distance diffusion that fills
//                     empty probability-histogram cells with the reference's
//                     exact in-round update order
//                     (ProbabilityRefinement.cpp:152-183);
//  * flood_partition— BFS flood-fill region partitioning in the reference's
//                     bottom-left column-major discovery order
//                     (ImageOperations.cpp:52-109; CloudMask.cpp:63-108);
//  * border_mask    — border extraction of a pixel blob
//                     (Functions::border, Functions.cpp:126-149);
//  * cloud_sweep /  — the 473-height ray-cast similarity scan for one cloud
//    cloud_detail     (CloudShadowMatching.cpp:70-152). The back-projection
//                     gather is hostile to XLA (irregular window gathers);
//                     on the host it is a cache-friendly affine scan. Must
//                     be compiled with -ffp-contract=off: the f32 affine
//                     must round like the XLA/numpy path (no FMA) so the
//                     truncation to pixel indices is bit-identical.
//
// Exposed with a plain C ABI and loaded via ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <queue>
#include <cstring>
#include <utility>
#include <vector>

extern "C" {

// grid: d*d floats indexed [j*d + i]; valid: d*d uint8 flags (mutated).
void hole_fill(float* grid, uint8_t* valid, int32_t d)
{
    std::vector<std::pair<int, int>> empty;
    empty.reserve(size_t(d) * d);
    for (int i = 0; i < d; i++)
        for (int j = 0; j < d; j++)
            if (!valid[j * d + i])
                empty.emplace_back(i, j);

    std::vector<std::pair<int, int>> remaining;
    while (!empty.empty()) {
        bool progressed = false;
        remaining.clear();
        for (auto [i, j] : empty) {
            float accum = 0.f;
            float weight = 0.f;
            bool found = false;
            for (int di = -1; di <= 1; di++) {
                for (int dj = -1; dj <= 1; dj++) {
                    if (di == 0 && dj == 0)
                        continue;
                    int ni = i + di;
                    int nj = j + dj;
                    if (ni < 0 || ni >= d || nj < 0 || nj >= d)
                        continue;
                    if (valid[nj * d + ni]) {
                        found = true;
                        float w = 1.f / float(di * di + dj * dj);
                        accum += grid[nj * d + ni] * w;
                        weight += w;
                    }
                }
            }
            if (found) {
                // visible to later cells within the same round — matches the
                // reference's list iteration with in-place erase
                valid[j * d + i] = 1;
                grid[j * d + i] = accum / weight;
                progressed = true;
            } else {
                remaining.emplace_back(i, j);
            }
        }
        if (!progressed)
            break; // no samples anywhere: nothing to diffuse from
        empty.swap(remaining);
    }
}

// mask: h*w uint8 (row-major, top-left origin). labels out: h*w int32, -1
// background. Returns the number of regions with area >= min_area; ids are
// assigned in bottom-left column-major first-encounter order.
int32_t flood_partition(
    const uint8_t* mask, int32_t h, int32_t w, int32_t min_area, int32_t* labels)
{
    const size_t n = size_t(h) * w;
    std::fill(labels, labels + n, -1);
    std::vector<uint8_t> used(n, 0);
    std::vector<int32_t> stack;
    std::vector<int32_t> comp;
    int32_t next_id = 0;

    for (int32_t i = 0; i < w; i++) {
        for (int32_t jj = 0; jj < h; jj++) {
            int32_t r = h - 1 - jj; // scan bottom row first (reference order)
            int32_t p = r * w + i;
            if (!mask[p] || used[p])
                continue;
            comp.clear();
            stack.clear();
            stack.push_back(p);
            used[p] = 1;
            while (!stack.empty()) {
                int32_t q = stack.back();
                stack.pop_back();
                comp.push_back(q);
                int32_t qr = q / w;
                int32_t qc = q % w;
                for (int32_t dr = -1; dr <= 1; dr++) {
                    for (int32_t dc = -1; dc <= 1; dc++) {
                        if (dr == 0 && dc == 0)
                            continue;
                        int32_t nr = qr + dr;
                        int32_t nc = qc + dc;
                        if (nr < 0 || nr >= h || nc < 0 || nc >= w)
                            continue;
                        int32_t np = nr * w + nc;
                        if (mask[np] && !used[np]) {
                            used[np] = 1;
                            stack.push_back(np);
                        }
                    }
                }
            }
            if (int32_t(comp.size()) >= min_area) {
                for (int32_t q : comp)
                    labels[q] = next_id;
                next_id++;
            }
        }
    }
    return next_id;
}

// mask: h*w uint8 over a region bbox; border out: h*w uint8. A set pixel is
// border when a 4-neighbour (clamped inside the bbox) is unset or it lies on
// the bbox edge.
void border_mask(const uint8_t* mask, int32_t h, int32_t w, uint8_t* border)
{
    for (int32_t r = 0; r < h; r++) {
        for (int32_t c = 0; c < w; c++) {
            int32_t p = r * w + c;
            if (!mask[p]) {
                border[p] = 0;
                continue;
            }
            auto at = [&](int32_t rr, int32_t cc) {
                rr = rr < 0 ? 0 : (rr >= h ? h - 1 : rr);
                cc = cc < 0 ? 0 : (cc >= w ? w - 1 : cc);
                return mask[rr * w + cc];
            };
            bool edge = r == 0 || r == h - 1 || c == 0 || c == w - 1;
            bool interior = at(r - 1, c) && at(r + 1, c) && at(r, c - 1) && at(r, c + 1);
            border[p] = (edge || !interior) ? 1 : 0;
        }
    }
}

// Similarity of one cloud across nh cast heights. Arrays are the flipped
// (bottom-origin-row) padded rasters used by the matching module: cmask/psm
// u8 (H, W), cmap i32 (H, W) holding compact cloud ids (-1/-2 elsewhere).
// Per height: window [mny..mxy]x[mnx..mxx]; a pixel p is a candidate when
// it is not cloud, its f32 affine back-projection q = A2*p + delta lands
// in-image (trunc toward zero like glm ivec2) and cmap[q] == cid; a hit is
// a candidate on the potential-shadow mask. sim = hits/candidates when
// candidates >= min_support else -1.1 (the sweep kernel's sentinel).
void cloud_sweep(
    const uint8_t* cmask, const uint8_t* psm, const int32_t* cmap,
    int32_t W_pad, int32_t width, int32_t height, int32_t cid, int32_t nh,
    const int32_t* mnx, const int32_t* mny, const int32_t* mxx, const int32_t* mxy,
    const float* a2 /* nh*4: a00,a01,a10,a11 */, const float* delta /* nh*2 */,
    int32_t min_support, float* sims_out)
{
#pragma omp parallel for schedule(dynamic, 8)
    for (int32_t h = 0; h < nh; h++) {
        const float a00 = a2[h * 4 + 0], a01 = a2[h * 4 + 1];
        const float a10 = a2[h * 4 + 2], a11 = a2[h * 4 + 3];
        const float d0 = delta[h * 2 + 0], d1 = delta[h * 2 + 1];
        int64_t cand = 0, hits = 0;
        for (int32_t y = mny[h]; y <= mxy[h]; y++) {
            const float fy = float(y);
            const uint8_t* cm_row = cmask + int64_t(y) * W_pad;
            const uint8_t* ps_row = psm + int64_t(y) * W_pad;
            for (int32_t x = mnx[h]; x <= mxx[h]; x++) {
                if (cm_row[x])
                    continue;
                const float fx = float(x);
                const float qx = a00 * fx + a01 * fy + d0;
                const float qy = a10 * fx + a11 * fy + d1;
                const int32_t qi = int32_t(qx); // trunc toward zero
                const int32_t qj = int32_t(qy);
                if (qi < 0 || qi >= width || qj < 0 || qj >= height)
                    continue;
                if (cmap[int64_t(qj) * W_pad + qi] != cid)
                    continue;
                cand++;
                hits += ps_row[x] ? 1 : 0;
            }
        }
        // f32/f32 division exactly like the XLA sweep kernel
        sims_out[h] = (cand >= min_support) ? float(hits) / float(cand) : -1.1f;
    }
}

// Hit detail at one height: hit window (hb x wb u8, anchored at (mnx, mny)),
// candidate/hit counts, and the hit-pixel bounds (x0,y0,x1,y1; +-2^30
// sentinels when no hits) — the _bucket_detail contract.
void cloud_detail(
    const uint8_t* cmask, const uint8_t* psm, const int32_t* cmap,
    int32_t W_pad, int32_t width, int32_t height, int32_t cid,
    int32_t mnx, int32_t mny, int32_t mxx, int32_t mxy,
    float a00, float a01, float a10, float a11, float d0, float d1,
    int32_t hb, int32_t wb, uint8_t* hit_win,
    int32_t* counts /* t, c */, int32_t* bounds /* x0,y0,x1,y1 */)
{
    std::memset(hit_win, 0, size_t(hb) * size_t(wb));
    const int32_t big = 1 << 30;
    int32_t t = 0, c = 0, bx0 = big, by0 = big, bx1 = -big, by1 = -big;
    for (int32_t y = mny; y <= mxy && y < mny + hb; y++) {
        const float fy = float(y);
        const uint8_t* cm_row = cmask + int64_t(y) * W_pad;
        const uint8_t* ps_row = psm + int64_t(y) * W_pad;
        for (int32_t x = mnx; x <= mxx && x < mnx + wb; x++) {
            if (cm_row[x])
                continue;
            const float fx = float(x);
            const float qx = a00 * fx + a01 * fy + d0;
            const float qy = a10 * fx + a11 * fy + d1;
            const int32_t qi = int32_t(qx);
            const int32_t qj = int32_t(qy);
            if (qi < 0 || qi >= width || qj < 0 || qj >= height)
                continue;
            if (cmap[int64_t(qj) * W_pad + qi] != cid)
                continue;
            t++;
            if (ps_row[x]) {
                c++;
                hit_win[int64_t(y - mny) * wb + (x - mnx)] = 1;
                bx0 = x < bx0 ? x : bx0;
                by0 = y < by0 ? y : by0;
                bx1 = x > bx1 ? x : bx1;
                by1 = y > by1 ? y : by1;
            }
        }
    }
    counts[0] = t;
    counts[1] = c;
    bounds[0] = bx0;
    bounds[1] = by0;
    bounds[2] = bx1;
    bounds[3] = by1;
}



// Priority-flood pit fill (morphological reconstruction by erosion):
// W(p) = max(orig(p), min over escape paths pi to the outside of
// max(orig along pi, border)) — the same from-above fixpoint as the
// reference's iterative kernel (PitFillAlgorithm.cpp:28-91), computed in
// O(n log n) with Barnes-style priority flooding + a FIFO for cells at the
// current water level. Pure max/min selection of existing f32 values — no
// arithmetic — so the result is bit-exact with the Jacobi fixpoint.
void pit_fill_flood(const float* orig, float* out, int32_t h, int32_t w, float border)
{
    const int64_t n = int64_t(h) * w;
    std::vector<uint8_t> visited(size_t(n), 0);
    using Item = std::pair<float, uint32_t>;
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
    std::queue<Item> fifo;

    auto push = [&](int64_t i, float lvl) {
        if (visited[size_t(i)])
            return;
        visited[size_t(i)] = 1;
        float o = orig[i];
        if (o <= lvl) {
            fifo.push({lvl, uint32_t(i)});  // at the water level: plain queue
        } else {
            pq.push({o, uint32_t(i)});
        }
    };

    for (int32_t c = 0; c < w; ++c) {
        push(c, border);
        push(int64_t(h - 1) * w + c, border);
    }
    for (int32_t r = 0; r < h; ++r) {
        push(int64_t(r) * w, border);
        push(int64_t(r) * w + (w - 1), border);
    }

    while (!pq.empty() || !fifo.empty()) {
        float lvl;
        uint32_t i;
        if (!fifo.empty() && (pq.empty() || fifo.front().first <= pq.top().first)) {
            lvl = fifo.front().first;
            i = fifo.front().second;
            fifo.pop();
        } else {
            lvl = pq.top().first;
            i = pq.top().second;
            pq.pop();
        }
        out[i] = lvl;
        int32_t r = int32_t(i / uint32_t(w));
        int32_t c = int32_t(i % uint32_t(w));
        for (int dr = -1; dr <= 1; ++dr) {
            for (int dc = -1; dc <= 1; ++dc) {
                if (!dr && !dc)
                    continue;
                int32_t nr = r + dr;
                int32_t nc = c + dc;
                if (nr < 0 || nr >= h || nc < 0 || nc >= w)
                    continue;
                push(int64_t(nr) * w + nc, lvl);
            }
        }
    }
}

// All histogram resolutions of the probability surface in ONE pass over the
// rasters (ProbabilityRefinement.cpp:137-151): for each pixel, bin
// (alpha, beta) at every d in divisions and accumulate count + shadow sum.
// counts/sums are laid out per-division consecutively (d*d cells each).
void prob_histograms(const float* alpha, const float* beta, const uint8_t* shadow,
                     int64_t n, const int32_t* divisions, int32_t n_div,
                     int64_t* counts, double* sums)
{
    std::vector<int64_t> offs(size_t(n_div), 0);
    int64_t off = 0;
    for (int32_t k = 0; k < n_div; ++k) {
        offs[size_t(k)] = off;
        off += int64_t(divisions[k]) * divisions[k];
    }
    for (int64_t p = 0; p < n; ++p) {
        float a = alpha[p];
        float b = beta[p];
        float s = shadow[p] ? 1.f : 0.f;
        for (int32_t k = 0; k < n_div; ++k) {
            int32_t d = divisions[k];
            // match numpy: i = clip(floor(a*d), 0, d-1) with f32 multiply
            float fa = a * float(d);
            float fb = b * float(d);
            int32_t i = int32_t(std::floor(fa));
            int32_t j = int32_t(std::floor(fb));
            i = i < 0 ? 0 : (i >= d ? d - 1 : i);
            j = j < 0 ? 0 : (j >= d ? d - 1 : j);
            int64_t cell = offs[size_t(k)] + int64_t(j) * d + i;
            counts[cell] += 1;
            sums[cell] += double(s);
        }
    }
}


// Final-mask sampling (ProbabilityRefinement.cpp:226-241 with operator()
// :264-283): bilinear over the extended surface table at (alpha, beta),
// thresholded, OR object-shadow, AND NOT cloud. ``ext`` is the
// (n+2)x(n+2) table of surface.at(i,j) for i,j in [-1,n]; alpha/beta are
// probabilities in [0,1] so every touched cell is inside it. f32 ops in
// the numpy order (compiled -ffp-contract=off) — bit-identical to the
// host numpy sampling.
void final_mask_sample(const float* alpha, const float* beta,
                       const float* ext, int32_t next /* n+2 */,
                       const uint8_t* object_mask, const uint8_t* cloud_mask,
                       float threshold, int64_t n, uint8_t* out)
{
    const int32_t dim = next - 2;
    const float fdim = float(dim);
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < n; ++p) {
        const float cellx = alpha[p] * fdim;
        const float celly = beta[p] * fdim;
        const float rx = cellx >= 0.f ? std::floor(cellx + 0.5f) : std::ceil(cellx - 0.5f);
        const float ry = celly >= 0.f ? std::floor(celly + 0.5f) : std::ceil(celly - 0.5f);
        const int32_t x_max = int32_t(rx);
        const int32_t y_max = int32_t(ry);
        const int32_t x_min = x_max - 1;
        const int32_t y_min = y_max - 1;
        const float p0 = ext[int64_t(y_min + 1) * next + (x_min + 1)];
        const float p1 = ext[int64_t(y_min + 1) * next + (x_max + 1)];
        const float p2 = ext[int64_t(y_max + 1) * next + (x_min + 1)];
        const float p3 = ext[int64_t(y_max + 1) * next + (x_max + 1)];
        const float u = cellx - (float(x_min) + 0.5f);
        const float v = celly - (float(y_min) + 0.5f);
        const float bottom = (1.f - u) * p0 + u * p1;
        const float top = (1.f - u) * p2 + u * p3;
        const float prob = (1.f - v) * bottom + v * top;
        const uint8_t ret = (prob >= threshold) || object_mask[p];
        out[p] = ret && !cloud_mask[p];
    }
}

} // extern "C"
