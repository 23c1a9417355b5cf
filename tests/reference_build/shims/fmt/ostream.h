#pragma once

#include "format.h"

namespace fmt {
struct ostream_formatter {};
} // namespace fmt
