// Symbolized backtrace on assertion failure — parity with the reference's
// debug assert machinery (`host/inc/fpga_assert.h:18-45`,
// `host/src/stack_trace.cpp:19-80`: backtrace() + abi::__cxa_demangle).

#ifndef HEXL_FPGA_TPU_STACK_TRACE_HPP_
#define HEXL_FPGA_TPU_STACK_TRACE_HPP_

namespace hexl_tpu {

// Print a demangled stack trace to stderr.
void print_stack_trace();

}  // namespace hexl_tpu

#endif  // HEXL_FPGA_TPU_STACK_TRACE_HPP_
