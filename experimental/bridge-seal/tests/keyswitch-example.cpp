// End-to-end validation of the SEAL bridge: CKKS square+relinearize and
// rotate run through a SEAL build patched to call intel::hexl::KeySwitch
// (served by hexl-tpu), with a decoded-precision check against the plain
// computation.  This mirrors the workload of the reference bridge's e2e
// test flow (`/root/reference/experimental/bridge-seal/tests/`); the same
// semantics are additionally validated offline, without SEAL, by
// hexl_fpga_tpu/integrations/ckks.py + tests/test_ckks.py.
//
// Build/run: see ../apply.sh (requires a patched SEAL v4.0.0 checkout).

#include <cmath>
#include <complex>
#include <cstdio>
#include <vector>

#include "seal/seal.h"

using namespace seal;

static double max_err(const std::vector<std::complex<double>> &got,
                      const std::vector<std::complex<double>> &want,
                      size_t count) {
  double m = 0.0;
  for (size_t i = 0; i < count; ++i) m = std::max(m, std::abs(got[i] - want[i]));
  return m;
}

int main() {
  EncryptionParameters parms(scheme_type::ckks);
  const size_t n = 16384;
  parms.set_poly_modulus_degree(n);
  parms.set_coeff_modulus(CoeffModulus::Create(n, {52, 40, 40, 40, 40, 40, 52}));
  const double scale = std::pow(2.0, 40);

  SEALContext context(parms);
  KeyGenerator keygen(context);
  auto secret_key = keygen.secret_key();
  PublicKey public_key;
  keygen.create_public_key(public_key);
  RelinKeys relin_keys;
  keygen.create_relin_keys(relin_keys);
  GaloisKeys galois_keys;
  keygen.create_galois_keys(galois_keys);

  Encryptor encryptor(context, public_key);
  Evaluator evaluator(context);
  Decryptor decryptor(context, secret_key);
  CKKSEncoder encoder(context);
  const size_t slots = encoder.slot_count();

  std::vector<std::complex<double>> input(slots);
  for (size_t i = 0; i < slots; ++i)
    input[i] = {0.5 + 0.001 * static_cast<double>(i % 100), 0.0};

  Plaintext pt;
  encoder.encode(input, scale, pt);
  Ciphertext ct;
  encryptor.encrypt(pt, ct);

  // square + relinearize + rescale  (relinearize -> KeySwitch on device)
  Ciphertext sq;
  evaluator.square(ct, sq);
  evaluator.relinearize_inplace(sq, relin_keys);
  evaluator.rescale_to_next_inplace(sq);
  Plaintext out_pt;
  decryptor.decrypt(sq, out_pt);
  std::vector<std::complex<double>> got;
  encoder.decode(out_pt, got);
  std::vector<std::complex<double>> want(slots);
  for (size_t i = 0; i < slots; ++i) want[i] = input[i] * input[i];
  double err = max_err(got, want, slots);
  std::printf("square+relinearize max err: %.3e\n", err);
  if (err > 1e-6) {
    std::printf("FAIL: precision above bound\n");
    return 1;
  }

  // rotate (Galois key switch on device)
  Ciphertext rot;
  evaluator.rotate_vector(ct, 1, galois_keys, rot);
  decryptor.decrypt(rot, out_pt);
  encoder.decode(out_pt, got);
  for (size_t i = 0; i < slots; ++i) want[i] = input[(i + 1) % slots];
  err = max_err(got, want, slots);
  std::printf("rotate(1) max err: %.3e\n", err);
  if (err > 1e-6) {
    std::printf("FAIL: precision above bound\n");
    return 1;
  }

  std::printf("bridge keyswitch-example: ALL OK\n");
  return 0;
}
