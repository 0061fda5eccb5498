// Minimal SEAL-4.0.0-SHAPED public-API declarations (NOT SEAL code) so the
// bridge's e2e example (tests/keyswitch-example.cpp) can be SYNTAX-checked
// offline by compile_check.sh: every call the example makes is declared
// with the SEAL 4.0.0 signature shapes.  A real build still uses a patched
// SEAL checkout (apply.sh) — this gate only proves the example's API usage
// compiles against the 4.0.0 surface.
#pragma once

#include <complex>
#include <cstddef>
#include <cstdint>
#include <vector>

namespace seal {

enum class scheme_type : std::uint8_t { none = 0, bfv = 1, ckks = 2, bgv = 3 };

class Modulus {
 public:
    std::uint64_t value() const noexcept;
};

class CoeffModulus {
 public:
    static std::vector<Modulus> Create(std::size_t poly_modulus_degree,
                                       std::vector<int> bit_sizes);
};

class EncryptionParameters {
 public:
    explicit EncryptionParameters(scheme_type scheme);
    void set_poly_modulus_degree(std::size_t poly_modulus_degree);
    void set_coeff_modulus(const std::vector<Modulus> &coeff_modulus);
};

class SEALContext {
 public:
    explicit SEALContext(const EncryptionParameters &parms);
};

class Plaintext {};
class Ciphertext {};
class SecretKey {};
class PublicKey {};
class RelinKeys {};
class GaloisKeys {};

class KeyGenerator {
 public:
    explicit KeyGenerator(const SEALContext &context);
    const SecretKey &secret_key() const;
    void create_public_key(PublicKey &destination);
    void create_relin_keys(RelinKeys &destination);
    void create_galois_keys(GaloisKeys &destination);
};

class Encryptor {
 public:
    Encryptor(const SEALContext &context, const PublicKey &public_key);
    void encrypt(const Plaintext &plain, Ciphertext &destination);
};

class Evaluator {
 public:
    explicit Evaluator(const SEALContext &context);
    void square(const Ciphertext &encrypted, Ciphertext &destination);
    void relinearize_inplace(Ciphertext &encrypted,
                             const RelinKeys &relin_keys);
    void rescale_to_next_inplace(Ciphertext &encrypted);
    void rotate_vector(const Ciphertext &encrypted, int steps,
                       const GaloisKeys &galois_keys,
                       Ciphertext &destination);
};

class Decryptor {
 public:
    Decryptor(const SEALContext &context, const SecretKey &secret_key);
    void decrypt(const Ciphertext &encrypted, Plaintext &destination);
};

class CKKSEncoder {
 public:
    explicit CKKSEncoder(const SEALContext &context);
    std::size_t slot_count() const;
    void encode(const std::vector<std::complex<double>> &values,
                double scale, Plaintext &destination);
    void decode(const Plaintext &plain,
                std::vector<std::complex<double>> &destination);
};

}  // namespace seal
