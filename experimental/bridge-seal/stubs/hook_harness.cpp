// Offline compile gate for the SEAL bridge hook (compile_check.sh).
//
// The evaluator hunk's ADDED LINES are extracted from the patch bytes at
// check time into hook_body.inc (so this gate can never drift from the
// shipped patch) and compiled here inside a function whose local
// declarations mirror SEAL 4.0.0's switch_key_inplace scope — against the
// REAL cpp/include/hexl-fpga.h.  This proves (a) the hook is valid C++ in
// a SEAL-shaped scope and (b) every intel::hexl::KeySwitch argument type
// matches the shipped accelerator ABI exactly.  The full e2e compile
// against a real SEAL tree still needs the network (apply.sh).
#define SEAL_USE_HEXL_TPU 1

#include <cstddef>
#include <cstdint>
#include <vector>

#include "hexl-fpga.h"
#include "seal_shapes.hpp"

using namespace std;
using namespace seal;
using namespace seal::util;

void switch_key_inplace_hook_fragment(
    Ciphertext &encrypted, ConstRNSIter target_iter,
    const vector<PublicKey> &key_vector,
    const EncryptionParameters &key_parms, scheme_type scheme,
    size_t coeff_count, size_t decomp_modulus_size, size_t key_modulus_size,
    size_t rns_modulus_size, size_t key_component_count,
    const vector<MultiplyUIntModOperand> &modswitch_factors) {
#include "hook_body.inc"
}
