#include "stack_trace.hpp"

#include <cxxabi.h>
#include <execinfo.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace hexl_tpu {

void print_stack_trace() {
  void* frames[64];
  const int depth = backtrace(frames, 64);
  char** symbols = backtrace_symbols(frames, depth);
  if (!symbols) return;
  std::fprintf(stderr, "stack trace (%d frames):\n", depth);
  for (int i = 1; i < depth; ++i) {  // skip this frame
    // symbol format: module(mangled+offset) [addr] — demangle the middle
    char* line = symbols[i];
    char* begin = std::strchr(line, '(');
    char* plus = begin ? std::strchr(begin, '+') : nullptr;
    if (begin && plus && plus > begin + 1) {
      *plus = '\0';
      int status = 0;
      char* demangled =
          abi::__cxa_demangle(begin + 1, nullptr, nullptr, &status);
      std::fprintf(stderr, "  #%-2d %s\n", i,
                   status == 0 && demangled ? demangled : begin + 1);
      std::free(demangled);
      *plus = '+';
    } else {
      std::fprintf(stderr, "  #%-2d %s\n", i, line);
    }
  }
  std::free(symbols);
}

}  // namespace hexl_tpu
