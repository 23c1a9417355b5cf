// Minimal fmt stand-in: the reference's approx numeric path only touches
// fmt through log-message formatting (swallowed by the spdlog shim) and
// the formatter specialization machinery in utils/date.h. Nothing numeric.
#pragma once

#include <sstream>
#include <string>

namespace fmt {

template <typename T, typename Char = char>
struct formatter;

template <typename... Args>
inline std::string format(std::string_view f, Args&&...)
{
    return std::string(f);
}

} // namespace fmt
