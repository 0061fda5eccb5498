// Minimal SEAL-4.0.0-SHAPED declarations for the offline compile gate
// (compile_check.sh).  NOT SEAL code: just the type shapes the bridge
// hook touches, re-declared from the SEAL 4.0.0 public API so that the
// patch hunk and the example can be syntax-checked against the REAL
// cpp/include/hexl-fpga.h without a SEAL checkout (this build environment
// has no network; the reference compiles its bridge against a downloaded
// SEAL tree, `/root/reference/experimental/bridge-seal/README.md`).
//
// Shape sources (SEAL v4.0.0 public headers):
//   scheme_type                    native/src/seal/encryptionparams.h
//   Modulus::value                 native/src/seal/modulus.h
//   Ciphertext::data               native/src/seal/ciphertext.h
//   PublicKey::data                native/src/seal/publickey.h
//   util::MultiplyUIntModOperand   native/src/seal/util/uintarithsmallmod.h
//   util::ConstRNSIter             native/src/seal/util/iterator.h
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace seal {

enum class scheme_type : std::uint8_t { none = 0, bfv = 1, ckks = 2, bgv = 3 };

class Modulus {
 public:
    std::uint64_t value() const noexcept { return value_; }

 private:
    std::uint64_t value_ = 0;
};

class EncryptionParameters {
 public:
    const std::vector<Modulus> &coeff_modulus() const noexcept {
        return coeff_modulus_;
    }

 private:
    std::vector<Modulus> coeff_modulus_;
};

class Ciphertext {
 public:
    std::uint64_t *data() noexcept { return data_.data(); }
    const std::uint64_t *data() const noexcept { return data_.data(); }
    // PublicKey-ish view used by the hook: key_vector entries expose the
    // underlying ciphertext's coefficient buffer via .data().data()
    std::vector<std::uint64_t> &dyn() noexcept { return data_; }

 private:
    std::vector<std::uint64_t> data_;
};

class PublicKey {
 public:
    Ciphertext &data() noexcept { return ct_; }
    const Ciphertext &data() const noexcept { return ct_; }

 private:
    Ciphertext ct_;
};

namespace util {

struct MultiplyUIntModOperand {
    std::uint64_t operand = 0;
    std::uint64_t quotient = 0;
};

// ConstRNSIter shape: *it -> ConstCoeffIter; (*it)[k] -> const uint64_t&
class ConstCoeffIter {
 public:
    explicit ConstCoeffIter(const std::uint64_t *p = nullptr) : p_(p) {}
    const std::uint64_t &operator[](std::size_t k) const { return p_[k]; }

 private:
    const std::uint64_t *p_;
};

class ConstRNSIter {
 public:
    ConstRNSIter(const std::uint64_t *p, std::size_t n) : p_(p), n_(n) {}
    ConstCoeffIter operator*() const { return ConstCoeffIter(p_); }

 private:
    const std::uint64_t *p_;
    std::size_t n_;
};

}  // namespace util
}  // namespace seal
