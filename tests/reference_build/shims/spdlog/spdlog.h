// Minimal spdlog stand-in for compiling the UNMODIFIED reference
// translation units offline (the real spdlog is not in this image and
// there is no egress). Logging is observability-only in the reference's
// approx path — every numeric statement is untouched; these shims just
// swallow the messages.
#pragma once

#include <fstream>  // the real spdlog pulls this in transitively; the
                    // reference's poisson.cpp relies on that for ofstream
#include <memory>
#include <string>
#include <string_view>

namespace spdlog {

class logger {
public:
    explicit logger(std::string name) : m_name(std::move(name)) {}
    template <typename... Args> void trace(Args&&...) {}
    template <typename... Args> void debug(Args&&...) {}
    template <typename... Args> void info(Args&&...) {}
    template <typename... Args> void warn(Args&&...) {}
    template <typename... Args> void error(Args&&...) {}
    template <typename... Args> void critical(Args&&...) {}

private:
    std::string m_name;
};

template <typename... Args> inline void trace(Args&&...) {}
template <typename... Args> inline void debug(Args&&...) {}
template <typename... Args> inline void info(Args&&...) {}
template <typename... Args> inline void warn(Args&&...) {}
template <typename... Args> inline void error(Args&&...) {}
template <typename... Args> inline void critical(Args&&...) {}

} // namespace spdlog
