#pragma once

#include <chrono>

namespace spdlog {
class stopwatch {
public:
    stopwatch() : m_start(clock::now()) {}
    std::chrono::duration<double> elapsed() const
    {
        return std::chrono::duration<double>(clock::now() - m_start);
    }

private:
    using clock = std::chrono::steady_clock;
    clock::time_point m_start;
};
} // namespace spdlog
