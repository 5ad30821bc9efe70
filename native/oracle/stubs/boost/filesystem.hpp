// boost.filesystem shim for the oracle build: the path / temp-dir surface
// used by the reference's util/io.hpp MakeTempDir/MakeTempFilename, backed
// by std::filesystem. unique_path() expands the boost "%%%%" placeholders
// with random hex digits, matching boost's contract.
#ifndef ORACLE_STUB_BOOST_FILESYSTEM_HPP_
#define ORACLE_STUB_BOOST_FILESYSTEM_HPP_

#include <filesystem>
#include <random>
#include <string>

namespace boost {
namespace filesystem {

class path {
 public:
  path() {}
  path(const char* s) : p_(s) {}                    // NOLINT(runtime/explicit)
  path(const std::string& s) : p_(s) {}             // NOLINT(runtime/explicit)
  path(const std::filesystem::path& p) : p_(p) {}   // NOLINT(runtime/explicit)
  std::string string() const { return p_.string(); }
  bool empty() const { return p_.empty(); }
  friend path operator/(const path& a, const path& b) {
    return path(a.p_ / b.p_);
  }
  const std::filesystem::path& native() const { return p_; }

 private:
  std::filesystem::path p_;
};

inline path temp_directory_path() {
  return path(std::filesystem::temp_directory_path());
}

inline path unique_path(const path& model) {
  static std::mt19937 eng{std::random_device{}()};
  std::uniform_int_distribution<int> hex(0, 15);
  std::string s = model.string();
  for (char& c : s) {
    if (c == '%') c = "0123456789abcdef"[hex(eng)];
  }
  return path(s);
}

inline bool create_directory(const path& p) {
  std::error_code ec;
  return std::filesystem::create_directory(p.native(), ec) && !ec;
}

}  // namespace filesystem
}  // namespace boost

#endif  // ORACLE_STUB_BOOST_FILESYSTEM_HPP_
