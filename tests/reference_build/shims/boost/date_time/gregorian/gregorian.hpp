// Minimal boost::gregorian stand-in, just enough to compile the reference
// approx headers (utils/date.h, approx/db.h) and poisson.cpp. The numeric
// solve path never touches dates; find_good_close_image's date math runs
// through this shim only in the oracle harness's tests of that helper
// (proleptic-Gregorian day counts, the same arithmetic boost uses).
#pragma once

#include <cstdint>
#include <stdexcept>
#include <string>

namespace boost {
namespace gregorian {

namespace detail {
// days since civil epoch 1970-01-01 (Howard Hinnant's civil_from_days
// inverse — exact proleptic Gregorian, same ordering boost provides)
inline std::int64_t days_from_civil(int y, unsigned m, unsigned d)
{
    y -= m <= 2;
    const std::int64_t era = (y >= 0 ? y : y - 399) / 400;
    const unsigned yoe = static_cast<unsigned>(y - era * 400);
    const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
    const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
    return era * 146097 + static_cast<std::int64_t>(doe) - 719468;
}
} // namespace detail

struct days {
    explicit days(std::int64_t n) : n(n) {}
    std::int64_t days_count() const { return n; }
    std::int64_t n;
};

class date {
public:
    date() = default;
    date(int y, int m, int d) : m_y(y), m_m(m), m_d(d) {}
    int year() const { return m_y; }
    int month() const { return m_m; }
    int day() const { return m_d; }

    friend days operator-(date const& a, date const& b)
    {
        return days(
            detail::days_from_civil(a.m_y, a.m_m, a.m_d)
            - detail::days_from_civil(b.m_y, b.m_m, b.m_d));
    }
    bool operator==(date const& o) const
    {
        return m_y == o.m_y && m_m == o.m_m && m_d == o.m_d;
    }
    bool operator<(date const& o) const
    {
        return (date(*this) - o).days_count() < 0;
    }
    bool operator>(date const& o) const { return o < *this; }
    bool operator<=(date const& o) const { return !(o < *this); }
    bool operator>=(date const& o) const { return !(*this < o); }

private:
    int m_y = 1400, m_m = 1, m_d = 1;
};

inline date from_simple_string(std::string const& s)
{
    // "YYYY-MM-DD"
    if (s.size() < 10)
        throw std::invalid_argument("bad date string: " + s);
    return date(
        std::stoi(s.substr(0, 4)), std::stoi(s.substr(5, 2)),
        std::stoi(s.substr(8, 2)));
}

inline std::string _two(int v)
{
    return (v < 10 ? "0" : "") + std::to_string(v);
}

inline std::string to_iso_extended_string(date const& d)
{
    return std::to_string(d.year()) + "-" + _two(d.month()) + "-" + _two(d.day());
}

inline std::string to_simple_string(date const& d)
{
    return to_iso_extended_string(d);
}

} // namespace gregorian
} // namespace boost
