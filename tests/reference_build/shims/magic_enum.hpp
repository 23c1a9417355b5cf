// Minimal magic_enum stand-in: only enum_name is used, and only inside
// error-log messages (swallowed by the spdlog shim).
#pragma once

#include <string_view>

namespace magic_enum {
template <typename E>
constexpr std::string_view enum_name(E)
{
    return "<enum>";
}
} // namespace magic_enum
