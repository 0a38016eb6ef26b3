#include "errors.h"

namespace sdtpu {

ErrorTable& global_error_table() {
  static ErrorTable table;
  return table;
}

}  // namespace sdtpu
