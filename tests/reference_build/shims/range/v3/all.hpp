// Minimal eager range-v3 stand-in for the pipelines the reference approx
// sources actually use:
//   vec | views::transform(f) | views::remove_if(p) | ranges::to<std::vector>()
//   minmax(vec | views::transform(f))
//   views::cartesian_product(views::ints(a, b), views::ints(c, d))
// Semantics match for these uses (pure, single-pass, no laziness observable).
#pragma once

#include <algorithm>
#include <cstdint>
#include <utility>
#include <vector>

namespace ranges {

namespace views {

template <typename F>
struct transform_t {
    F f;
};
template <typename F>
transform_t<F> transform(F f) { return { std::move(f) }; }

template <typename F>
struct remove_if_t {
    F f;
};
template <typename F>
remove_if_t<F> remove_if(F f) { return { std::move(f) }; }

inline std::vector<std::int64_t> ints(std::int64_t lo, std::int64_t hi)
{
    std::vector<std::int64_t> out;
    out.reserve(hi > lo ? static_cast<size_t>(hi - lo) : 0);
    for (std::int64_t v = lo; v < hi; ++v)
        out.push_back(v);
    return out;
}

template <typename A, typename B>
std::vector<std::pair<A, B>> cartesian_product(
    std::vector<A> const& a, std::vector<B> const& b)
{
    std::vector<std::pair<A, B>> out;
    out.reserve(a.size() * b.size());
    for (auto const& x : a)
        for (auto const& y : b)
            out.emplace_back(x, y);
    return out;
}

// the pipe operators live HERE so ADL (via the tag types' namespace)
// finds them from any caller namespace
template <typename T, typename F>
auto operator|(std::vector<T> const& v, transform_t<F> t)
    -> std::vector<decltype(t.f(std::declval<T>()))>
{
    std::vector<decltype(t.f(std::declval<T>()))> out;
    out.reserve(v.size());
    for (auto const& x : v)
        out.push_back(t.f(x));
    return out;
}

template <typename T, typename F>
std::vector<T> operator|(std::vector<T> v, remove_if_t<F> r)
{
    v.erase(std::remove_if(v.begin(), v.end(), r.f), v.end());
    return v;
}

} // namespace views

template <template <typename...> class C>
struct to_t {};

template <template <typename...> class C>
to_t<C> to() { return {}; }

template <typename T>
std::vector<T> operator|(std::vector<T> v, to_t<std::vector>)
{
    return v;
}

template <typename T>
std::pair<T, T> minmax(std::vector<T> const& v)
{
    auto [lo, hi] = std::minmax_element(v.begin(), v.end());
    return { *lo, *hi };
}

} // namespace ranges
