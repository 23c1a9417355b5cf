// True-Eigen solver oracle for parity testing.
//
// Re-implements the reference's EXACT system assembly + solver choice
// (/root/reference/lib/approx/source/laplace.cpp:31-119 and
//  /root/reference/lib/approx/source/poisson.cpp:145-290) against the
// vendored Eigen headers, so the rebuild's solvers can be compared with the
// genuine Eigen::ConjugateGradient<SparseMatrix<f64>, Lower|Upper> — the
// 1e-5 per-pixel parity claim of BASELINE.md, proven on real data.
//
// Written from the reference's documented contract; the assembly mirrors
// its quirks deliberately:
//  * the system spans the invalid-pixel BOUNDING BOX, identity rows for
//    known pixels;
//  * pixels on the IMAGE border are pinned even when marked invalid;
//  * Laplacian rows use -4 on the diagonal (+1 neighbours), knowns moved
//    to the RHS with b[i] -= v * pixel;
//  * default Eigen CG settings (tolerance = machine eps, maxIters = 2n).

#include <Eigen/Dense>
#include <Eigen/Sparse>

#include <cstdint>
#include <vector>

using Sparse = Eigen::SparseMatrix<double>;
using Triplet = Eigen::Triplet<double>;
using Solver = Eigen::ConjugateGradient<Sparse, Eigen::Lower | Eigen::Upper>;

extern "C" {

// img: row-major (rows, cols) f64, modified in place. invalid: u8 mask.
// Returns CG iterations, or -1 when there is nothing to do.
int eigen_laplace_fill(double* img, const std::uint8_t* invalid, int rows, int cols)
{
    auto inv = [&](int r, int c) { return invalid[r * cols + c] != 0; };
    auto val = [&](int r, int c) -> double& { return img[r * cols + c]; };

    int min_row = rows, max_row = -1, min_col = cols, max_col = -1;
    std::vector<std::pair<int, int>> invalid_pixels;
    for (int r = 0; r < rows; ++r)
        for (int c = 0; c < cols; ++c)
            if (inv(r, c)) {
                invalid_pixels.emplace_back(r, c);
                min_row = std::min(min_row, r);
                max_row = std::max(max_row, r);
                min_col = std::min(min_col, c);
                max_col = std::max(max_col, c);
            }
    if (invalid_pixels.empty())
        return -1;

    const int height = max_row - min_row + 1;
    const int width = max_col - min_col + 1;
    const long n = long(height) * long(width);
    auto index = [&](int r, int c) { return long(c - min_col) + long(r - min_row) * width; };

    Eigen::VectorXd b = Eigen::VectorXd::Zero(n);
    std::vector<Triplet> coeffs;
    coeffs.reserve(size_t(n) * 5);

    auto identity_row = [&](int r, int c) {
        long i = index(r, c);
        coeffs.emplace_back(i, i, 1.0);
        b[i] = val(r, c);
    };
    auto coefficient = [&](int r, int c, int dr, int dc, double v) {
        long i = index(r, c);
        int r2 = r + dr, c2 = c + dc;
        if (!inv(r2, c2)) {
            b[i] -= v * val(r2, c2);
            return;
        }
        coeffs.emplace_back(i, index(r2, c2), v);
    };

    for (int r = min_row; r <= max_row; ++r)
        for (int c = min_col; c <= max_col; ++c) {
            bool border = r == 0 || r == rows - 1 || c == 0 || c == cols - 1;
            if (border || !inv(r, c)) {
                identity_row(r, c);
            } else {
                coefficient(r, c, -1, 0, 1.0);
                coefficient(r, c, +1, 0, 1.0);
                coefficient(r, c, 0, -1, 1.0);
                coefficient(r, c, 0, +1, 1.0);
                coefficient(r, c, 0, 0, -4.0);
            }
        }

    Sparse A(n, n);
    A.setFromTriplets(coeffs.begin(), coeffs.end());
    Solver solver(A);
    Eigen::VectorXd x = solver.solve(b);

    for (auto [r, c] : invalid_pixels)
        val(r, c) = x[index(r, c)];
    return int(solver.iterations());
}

// Poisson mask-overload (poisson.cpp:145-290): unknowns = invalid pixels,
// A = |N(p)| diagonal with -1 for in-mask 4-neighbours; per-channel
// b = sum over in-image neighbours of (g_p - g_q) plus boundary values
// from the input image; warm start from the replacement values.
// imgs/repls: (channels, rows, cols) row-major f64; imgs modified in place.
int eigen_poisson_blend(
    double* imgs,
    const double* repls,
    const std::uint8_t* invalid,
    int channels,
    int rows,
    int cols,
    double tolerance,
    int max_iterations)
{
    auto inv = [&](int r, int c) { return invalid[r * cols + c] != 0; };
    const long plane = long(rows) * long(cols);

    std::vector<long> var(plane, -1);
    std::vector<std::pair<int, int>> unknowns;
    for (int r = 0; r < rows; ++r)
        for (int c = 0; c < cols; ++c)
            if (inv(r, c)) {
                var[long(r) * cols + c] = long(unknowns.size());
                unknowns.emplace_back(r, c);
            }
    const long n = long(unknowns.size());
    if (n == 0)
        return -1;

    static const int DR[4] = { -1, 1, 0, 0 };
    static const int DC[4] = { 0, 0, -1, 1 };

    std::vector<Triplet> coeffs;
    coeffs.reserve(size_t(n) * 5);
    for (long k = 0; k < n; ++k) {
        auto [r, c] = unknowns[size_t(k)];
        int degree = 0;
        for (int d = 0; d < 4; ++d) {
            int r2 = r + DR[d], c2 = c + DC[d];
            if (r2 < 0 || r2 >= rows || c2 < 0 || c2 >= cols)
                continue;
            ++degree;
            if (inv(r2, c2))
                coeffs.emplace_back(k, var[long(r2) * cols + c2], -1.0);
        }
        coeffs.emplace_back(k, k, double(degree));
    }
    Sparse A(n, n);
    A.setFromTriplets(coeffs.begin(), coeffs.end());

    Solver solver;
    solver.setTolerance(tolerance);
    // the reference always caps iterations, defaulting to n/2 (poisson.cpp:207)
    solver.setMaxIterations(max_iterations > 0 ? max_iterations : n / 2);
    solver.compute(A);

    int total_iters = 0;
    for (int ch = 0; ch < channels; ++ch) {
        double* img = imgs + long(ch) * plane;
        const double* g = repls + long(ch) * plane;
        Eigen::VectorXd b = Eigen::VectorXd::Zero(n);
        Eigen::VectorXd guess(n);
        for (long k = 0; k < n; ++k) {
            auto [r, c] = unknowns[size_t(k)];
            double acc = 0.0;
            for (int d = 0; d < 4; ++d) {
                int r2 = r + DR[d], c2 = c + DC[d];
                if (r2 < 0 || r2 >= rows || c2 < 0 || c2 >= cols)
                    continue;
                acc += g[long(r) * cols + c] - g[long(r2) * cols + c2];
                if (!inv(r2, c2))
                    acc += img[long(r2) * cols + c2];
            }
            b[k] = acc;
            guess[k] = g[long(r) * cols + c];
        }
        Eigen::VectorXd x = solver.solveWithGuess(b, guess);
        total_iters += int(solver.iterations());
        for (long k = 0; k < n; ++k) {
            auto [r, c] = unknowns[size_t(k)];
            img[long(r) * cols + c] = x[k];
        }
    }
    return total_iters;
}

}  // extern "C"
