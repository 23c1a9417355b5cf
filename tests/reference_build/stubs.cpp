// Link-time stubs for symbols the UNMODIFIED reference poisson.cpp object
// references but the oracle never executes (logging constructors, the
// SQLite-backed date-selection helpers used only by find_good_close_image).
// Nothing here is on the numeric path the oracle exercises.
#include <memory>
#include <stdexcept>
#include <string>

#include "approx/db.h"
#include "utils/error.h"
#include "utils/log.h"

namespace utils {

std::shared_ptr<spdlog::logger> create_logger(std::string const& name)
{
    return std::make_shared<spdlog::logger>(name);
}

IOError::IOError(std::string_view msg, fs::path path)
    : m_message(std::string(msg)), m_path(std::move(path))
{
}

GenericError::GenericError(std::string_view msg) : m_message(msg) {}
GenericError::GenericError(std::string_view msg, spdlog::logger&)
    : m_message(msg)
{
}

DBError::DBError(std::string_view msg, int error_code)
    : m_message(msg), m_error(error_code)
{
}
DBError::DBError(std::string_view msg, int error_code, spdlog::logger&)
    : m_message(msg), m_error(error_code)
{
}

} // namespace utils

namespace approx {

// MultiChannelImage's out-of-line constructor lives in utils.cpp, which the
// build compiles for real — no stub needed.

std::vector<DayInfo> DataBase::select_close_images(std::string const&)
{
    throw std::runtime_error("oracle stub: DB not available");
}

DayInfo DataBase::select_info_about_date(std::string const&)
{
    throw std::runtime_error("oracle stub: DB not available");
}

f64 DayInfo::distance(date_time::date const& other, f64 weight) const
{
    auto days = (date > other ? date - other : other - date).days_count();
    return weight * static_cast<f64>(days)
        + (1.0 - weight) * 100.0 * percent_invalid;
}

} // namespace approx
