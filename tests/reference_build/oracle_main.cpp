// Driver for the compiled REFERENCE poisson solver (poisson.cpp built
// unmodified from /root/reference): reads raw f64 arrays, runs the
// mask-overload blend_images_poisson, writes the raw result. Gives the
// parity tests a true reference-binary data point instead of a
// reimplemented oracle (VERDICT r4 item 9).
//
// argv: input.bin replacement.bin mask.bin C H W tolerance max_iters out.bin
// input/replacement: C*H*W f64 row-major; mask: H*W uint8.
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <vector>

#include "approx/poisson.h"
#include "approx/utils.h"

static std::vector<double> read_f64(char const* path, size_t n)
{
    std::ifstream in(path, std::ios::binary);
    std::vector<double> out(n);
    in.read(reinterpret_cast<char*>(out.data()), n * sizeof(double));
    if (!in) {
        std::cerr << "short read: " << path << "\n";
        std::exit(2);
    }
    return out;
}

int main(int argc, char** argv)
{
    if (argc != 10) {
        std::cerr << "usage: oracle input.bin replacement.bin mask.bin C H W "
                     "tol max_iters out.bin\n";
        return 2;
    }
    const size_t c = std::stoul(argv[4]);
    const size_t h = std::stoul(argv[5]);
    const size_t w = std::stoul(argv[6]);
    const double tol = std::stod(argv[7]);
    const long max_iters = std::stol(argv[8]);

    auto in_raw = read_f64(argv[1], c * h * w);
    auto rep_raw = read_f64(argv[2], c * h * w);
    std::ifstream mf(argv[3], std::ios::binary);
    std::vector<std::uint8_t> mask_raw(h * w);
    mf.read(reinterpret_cast<char*>(mask_raw.data()), h * w);
    if (!mf) {
        std::cerr << "short read: " << argv[3] << "\n";
        return 2;
    }

    auto to_mci = [&](std::vector<double> const& raw) {
        std::vector<utils::MatX<double>> ch;
        for (size_t k = 0; k < c; ++k) {
            utils::MatX<double> m(h, w);
            for (size_t r = 0; r < h; ++r)
                for (size_t col = 0; col < w; ++col)
                    m(r, col) = raw[k * h * w + r * w + col];
            ch.push_back(std::move(m));
        }
        return approx::MultiChannelImage(std::move(ch));
    };

    approx::MultiChannelImage input = to_mci(in_raw);
    approx::MultiChannelImage replacement = to_mci(rep_raw);
    utils::MatX<bool> mask(h, w);
    for (size_t r = 0; r < h; ++r)
        for (size_t col = 0; col < w; ++col)
            mask(r, col) = mask_raw[r * w + col] != 0;

    approx::blend_images_poisson(
        input, replacement, mask, tol,
        max_iters > 0 ? std::optional<int>(static_cast<int>(max_iters))
                      : std::nullopt);

    std::ofstream out(argv[9], std::ios::binary);
    for (size_t k = 0; k < c; ++k)
        for (size_t r = 0; r < h; ++r)
            for (size_t col = 0; col < w; ++col) {
                double v = input(k, r, col);
                out.write(reinterpret_cast<char const*>(&v), sizeof(double));
            }
    return 0;
}
