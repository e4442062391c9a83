// Native host-tier kernels for the Pasta curve cycle.
//
// This is the framework's C++ runtime layer (the analogue of the
// reference's arkworks native tier — reference crates/group/src/group.rs
// uses ark-ff/ark-ec/ark-poly for all of these).  The TPU owns the bulk
// device math (halo_tpu/ops/*); this library owns the host orchestration
// hot paths: trace-building EC work, sub-device-threshold MSMs, NTTs and
// the Poseidon permutation used by the Fiat-Shamir transcript.
//
// ABI: plain C, operating on arrays of 4x u64 little-endian limbs in
// CANONICAL (non-Montgomery) form; points are (x, y, inf_flag) column
// arrays.  Loaded from Python via ctypes (halo_tpu/native/__init__.py);
// every entry point has a pure-Python fallback.
//
// field ids: 0 = Fp (Pallas scalar / Vesta base), 1 = Fq (Pallas base /
// Vesta scalar).  curve ids: 0 = Pallas (base Fq), 1 = Vesta (base Fp).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

struct Fe {
  u64 v[4];
};

struct FieldParams {
  Fe mod;
  u64 n0inv;  // -mod^{-1} mod 2^64
  Fe r2;      // 2^512 mod p (Montgomery entry)
  Fe r1;      // 2^256 mod p (Montgomery one)
};

// Pasta moduli (reference crates/group/src/wrappers.rs:524-525,585-586).
constexpr FieldParams FP_PARAMS = {
    {{0x8c46eb2100000001ULL, 0x224698fc0994a8ddULL, 0x0ULL,
      0x4000000000000000ULL}},
    0x8c46eb20ffffffffULL,
    {{0xfc9678ff0000000fULL, 0x67bb433d891a16e3ULL, 0x7fae231004ccf590ULL,
      0x096d41af7ccfdaa9ULL}},
    {{0x5b2b3e9cfffffffdULL, 0x992c350be3420567ULL, 0xffffffffffffffffULL,
      0x3fffffffffffffffULL}},
};

constexpr FieldParams FQ_PARAMS = {
    {{0x992d30ed00000001ULL, 0x224698fc094cf91bULL, 0x0ULL,
      0x4000000000000000ULL}},
    0x992d30ecffffffffULL,
    {{0x8c78ecb30000000fULL, 0xd7d30dbd8b0de0e7ULL, 0x7797a99bc3c95d18ULL,
      0x096d41af7b9cb714ULL}},
    {{0x34786d38fffffffdULL, 0x992c350be41914adULL, 0xffffffffffffffffULL,
      0x3fffffffffffffffULL}},
};

inline const FieldParams& params(int fid) {
  return fid == 0 ? FP_PARAMS : FQ_PARAMS;
}

inline bool fe_is_zero(const Fe& a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

inline bool fe_eq(const Fe& a, const Fe& b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

inline bool fe_geq(const Fe& a, const Fe& b) {  // a >= b
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
  }
  return true;
}

inline void fe_sub_raw(Fe& out, const Fe& a, const Fe& b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    out.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void fe_add(const FieldParams& fp, Fe& out, const Fe& a, const Fe& b) {
  u128 carry = 0;
  Fe s;
  for (int i = 0; i < 4; ++i) {
    u128 t = (u128)a.v[i] + b.v[i] + carry;
    s.v[i] = (u64)t;
    carry = t >> 64;
  }
  if (carry || fe_geq(s, fp.mod)) {
    fe_sub_raw(out, s, fp.mod);
  } else {
    out = s;
  }
}

inline void fe_sub(const FieldParams& fp, Fe& out, const Fe& a, const Fe& b) {
  if (fe_geq(a, b)) {
    fe_sub_raw(out, a, b);
  } else {
    Fe t;
    fe_sub_raw(t, b, a);
    fe_sub_raw(out, fp.mod, t);
  }
}

inline void fe_neg(const FieldParams& fp, Fe& out, const Fe& a) {
  if (fe_is_zero(a)) {
    out = a;
  } else {
    fe_sub_raw(out, fp.mod, a);
  }
}

// CIOS Montgomery multiplication: out = a*b*R^{-1} mod p, R = 2^256.
inline void fe_mont_mul(const FieldParams& fp, Fe& out, const Fe& a,
                        const Fe& b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    // t += a[i] * b
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a.v[i] * b.v[j] + t[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 t4 = (u128)t[4] + carry;
    // m = t[0] * n0inv mod 2^64; t += m * p; t >>= 64
    u64 m = t[0] * fp.n0inv;
    u128 s = (u128)m * fp.mod.v[0] + t[0];
    carry = s >> 64;
    for (int j = 1; j < 4; ++j) {
      s = (u128)m * fp.mod.v[j] + t[j] + carry;
      t[j - 1] = (u64)s;
      carry = s >> 64;
    }
    t4 += carry;
    t[3] = (u64)t4;
    t[4] = (u64)(t4 >> 64);
  }
  Fe r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || fe_geq(r, fp.mod)) fe_sub_raw(out, r, fp.mod);
  else out = r;
}

inline void fe_mont_sq(const FieldParams& fp, Fe& out, const Fe& a) {
  fe_mont_mul(fp, out, a, a);
}

inline void fe_to_mont(const FieldParams& fp, Fe& out, const Fe& a) {
  fe_mont_mul(fp, out, a, fp.r2);
}

inline void fe_from_mont(const FieldParams& fp, Fe& out, const Fe& a) {
  Fe one = {{1, 0, 0, 0}};
  fe_mont_mul(fp, out, a, one);
}

// Montgomery-domain inversion via binary extended GCD (constant-time not
// required — host-side, public data only).  Input/output in Montgomery form.
inline void fe_mont_inv(const FieldParams& fp, Fe& out, const Fe& a) {
  // Convert out of Montgomery; invert canonically; convert back.
  Fe ac;
  fe_from_mont(fp, ac, a);
  // binary extended euclid on canonical value
  Fe u = ac, v = fp.mod;
  Fe x1 = {{1, 0, 0, 0}}, x2 = {{0, 0, 0, 0}};
  auto is_even = [](const Fe& x) { return (x.v[0] & 1) == 0; };
  auto shr1 = [](Fe& x) {
    for (int i = 0; i < 3; ++i) x.v[i] = (x.v[i] >> 1) | (x.v[i + 1] << 63);
    x.v[3] >>= 1;
  };
  auto half_mod = [&](Fe& x) {
    if (is_even(x)) {
      shr1(x);
    } else {
      // (x + p) / 2 with carry
      u128 carry = 0;
      Fe s;
      for (int i = 0; i < 4; ++i) {
        u128 t = (u128)x.v[i] + fp.mod.v[i] + carry;
        s.v[i] = (u64)t;
        carry = t >> 64;
      }
      for (int i = 0; i < 3; ++i) s.v[i] = (s.v[i] >> 1) | (s.v[i + 1] << 63);
      s.v[3] = (s.v[3] >> 1) | ((u64)carry << 63);
      x = s;
    }
  };
  Fe one = {{1, 0, 0, 0}};
  while (!fe_eq(u, one) && !fe_eq(v, one)) {
    while (is_even(u)) {
      shr1(u);
      half_mod(x1);
    }
    while (is_even(v)) {
      shr1(v);
      half_mod(x2);
    }
    if (fe_geq(u, v)) {
      fe_sub_raw(u, u, v);
      fe_sub(fp, x1, x1, x2);
    } else {
      fe_sub_raw(v, v, u);
      fe_sub(fp, x2, x2, x1);
    }
  }
  Fe inv_c = fe_eq(u, one) ? x1 : x2;
  // inv_c = ac^{-1} canonical; to Montgomery: *R => mont form of inverse;
  // but we need (aR)^{-1}*R^2 = a^{-1}R.  inv_c*R = a^{-1}R.
  fe_to_mont(fp, out, inv_c);
}

// ---------------- EC: short Weierstrass y^2 = x^3 + 5, Jacobian ----------

struct Jac {
  Fe X, Y, Z;  // Z == 0 (canonical/mont zero) => infinity
};

struct CurveCtx {
  const FieldParams* fp;  // base field params
};

inline CurveCtx curve_ctx(int curve) {
  // Pallas base field is Fq (fid 1); Vesta base field is Fp (fid 0).
  CurveCtx c;
  c.fp = curve == 0 ? &FQ_PARAMS : &FP_PARAMS;
  return c;
}

inline void jac_set_inf(const CurveCtx& c, Jac& P) {
  P.X = c.fp->r1;
  P.Y = c.fp->r1;
  std::memset(P.Z.v, 0, sizeof(P.Z.v));
}

inline bool jac_is_inf(const Jac& P) { return fe_is_zero(P.Z); }

inline void jac_double(const CurveCtx& c, Jac& out, const Jac& P) {
  const FieldParams& fp = *c.fp;
  if (jac_is_inf(P) || fe_is_zero(P.Y)) {
    jac_set_inf(c, out);
    return;
  }
  Fe A, B, C, D, E, F, t, X3, Y3, Z3;
  fe_mont_sq(fp, A, P.X);
  fe_mont_sq(fp, B, P.Y);
  fe_mont_sq(fp, C, B);
  // D = 2*((X+B)^2 - A - C)
  fe_add(fp, t, P.X, B);
  fe_mont_sq(fp, t, t);
  fe_sub(fp, t, t, A);
  fe_sub(fp, t, t, C);
  fe_add(fp, D, t, t);
  // E = 3A
  fe_add(fp, E, A, A);
  fe_add(fp, E, E, A);
  fe_mont_sq(fp, F, E);
  // X3 = F - 2D
  fe_sub(fp, X3, F, D);
  fe_sub(fp, X3, X3, D);
  // Y3 = E*(D - X3) - 8C
  fe_sub(fp, t, D, X3);
  fe_mont_mul(fp, Y3, E, t);
  Fe C8;
  fe_add(fp, C8, C, C);
  fe_add(fp, C8, C8, C8);
  fe_add(fp, C8, C8, C8);
  fe_sub(fp, Y3, Y3, C8);
  // Z3 = 2*Y*Z
  fe_mont_mul(fp, Z3, P.Y, P.Z);
  fe_add(fp, Z3, Z3, Z3);
  out.X = X3;
  out.Y = Y3;
  out.Z = Z3;
}

inline void jac_add(const CurveCtx& c, Jac& out, const Jac& P, const Jac& Q) {
  const FieldParams& fp = *c.fp;
  if (jac_is_inf(P)) {
    out = Q;
    return;
  }
  if (jac_is_inf(Q)) {
    out = P;
    return;
  }
  Fe Z1Z1, Z2Z2, U1, U2, S1, S2, t;
  fe_mont_sq(fp, Z1Z1, P.Z);
  fe_mont_sq(fp, Z2Z2, Q.Z);
  fe_mont_mul(fp, U1, P.X, Z2Z2);
  fe_mont_mul(fp, U2, Q.X, Z1Z1);
  fe_mont_mul(fp, t, P.Y, Q.Z);
  fe_mont_mul(fp, S1, t, Z2Z2);
  fe_mont_mul(fp, t, Q.Y, P.Z);
  fe_mont_mul(fp, S2, t, Z1Z1);
  if (fe_eq(U1, U2)) {
    if (!fe_eq(S1, S2)) {
      jac_set_inf(c, out);
      return;
    }
    jac_double(c, out, P);
    return;
  }
  Fe H, I, J, rr, V, X3, Y3, Z3;
  fe_sub(fp, H, U2, U1);
  fe_add(fp, t, H, H);
  fe_mont_sq(fp, I, t);
  fe_mont_mul(fp, J, H, I);
  fe_sub(fp, t, S2, S1);
  fe_add(fp, rr, t, t);
  fe_mont_mul(fp, V, U1, I);
  // X3 = rr^2 - J - 2V
  fe_mont_sq(fp, X3, rr);
  fe_sub(fp, X3, X3, J);
  fe_sub(fp, X3, X3, V);
  fe_sub(fp, X3, X3, V);
  // Y3 = rr*(V - X3) - 2*S1*J
  fe_sub(fp, t, V, X3);
  fe_mont_mul(fp, Y3, rr, t);
  fe_mont_mul(fp, t, S1, J);
  fe_add(fp, t, t, t);
  fe_sub(fp, Y3, Y3, t);
  // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H
  fe_add(fp, t, P.Z, Q.Z);
  fe_mont_sq(fp, t, t);
  fe_sub(fp, t, t, Z1Z1);
  fe_sub(fp, t, t, Z2Z2);
  fe_mont_mul(fp, Z3, t, H);
  out.X = X3;
  out.Y = Y3;
  out.Z = Z3;
}

// mixed add: Q affine (Z=1 in Montgomery form)
inline void jac_add_affine(const CurveCtx& c, Jac& out, const Jac& P,
                           const Fe& qx, const Fe& qy, bool q_inf) {
  const FieldParams& fp = *c.fp;
  if (q_inf) {
    out = P;
    return;
  }
  if (jac_is_inf(P)) {
    out.X = qx;
    out.Y = qy;
    out.Z = fp.r1;
    return;
  }
  Fe Z1Z1, U2, S2, t;
  fe_mont_sq(fp, Z1Z1, P.Z);
  fe_mont_mul(fp, U2, qx, Z1Z1);
  fe_mont_mul(fp, t, qy, P.Z);
  fe_mont_mul(fp, S2, t, Z1Z1);
  if (fe_eq(P.X, U2)) {
    if (!fe_eq(P.Y, S2)) {
      jac_set_inf(c, out);
      return;
    }
    jac_double(c, out, P);
    return;
  }
  Fe H, HH, I, J, rr, V, X3, Y3, Z3;
  fe_sub(fp, H, U2, P.X);
  fe_mont_sq(fp, HH, H);
  fe_add(fp, I, HH, HH);
  fe_add(fp, I, I, I);
  fe_mont_mul(fp, J, H, I);
  fe_sub(fp, t, S2, P.Y);
  fe_add(fp, rr, t, t);
  fe_mont_mul(fp, V, P.X, I);
  fe_mont_sq(fp, X3, rr);
  fe_sub(fp, X3, X3, J);
  fe_sub(fp, X3, X3, V);
  fe_sub(fp, X3, X3, V);
  fe_sub(fp, t, V, X3);
  fe_mont_mul(fp, Y3, rr, t);
  fe_mont_mul(fp, t, P.Y, J);
  fe_add(fp, t, t, t);
  fe_sub(fp, Y3, Y3, t);
  fe_add(fp, t, P.Z, H);
  fe_mont_sq(fp, t, t);
  fe_sub(fp, t, t, Z1Z1);
  fe_sub(fp, Z3, t, HH);
  out.X = X3;
  out.Y = Y3;
  out.Z = Z3;
}

inline void jac_neg(const CurveCtx& c, Jac& out, const Jac& P) {
  out.X = P.X;
  fe_neg(*c.fp, out.Y, P.Y);
  out.Z = P.Z;
}

// k given as 4 canonical u64 limbs (already < r); double-and-add MSB-first.
inline void jac_mul_u256(const CurveCtx& c, Jac& out, const Jac& P,
                         const u64 k[4]) {
  Jac acc;
  jac_set_inf(c, acc);
  bool started = false;
  for (int limb = 3; limb >= 0; --limb) {
    for (int bit = 63; bit >= 0; --bit) {
      if (started) jac_double(c, acc, acc);
      if ((k[limb] >> bit) & 1) {
        jac_add(c, acc, acc, P);
        started = true;
      }
    }
  }
  out = acc;
}

// Batch-normalize Jacobian -> affine (Montgomery trick, in Montgomery form).
inline void batch_normalize(const CurveCtx& c, std::vector<Jac>& pts,
                            Fe* xs, Fe* ys, uint8_t* infs) {
  const FieldParams& fp = *c.fp;
  size_t n = pts.size();
  std::vector<Fe> prefix(n + 1);
  prefix[0] = fp.r1;  // mont 1
  for (size_t i = 0; i < n; ++i) {
    if (fe_is_zero(pts[i].Z)) {
      prefix[i + 1] = prefix[i];
    } else {
      fe_mont_mul(fp, prefix[i + 1], prefix[i], pts[i].Z);
    }
  }
  Fe total_inv;
  fe_mont_inv(fp, total_inv, prefix[n]);
  for (size_t ii = n; ii-- > 0;) {
    if (fe_is_zero(pts[ii].Z)) {
      infs[ii] = 1;
      std::memset(xs[ii].v, 0, sizeof(Fe));
      std::memset(ys[ii].v, 0, sizeof(Fe));
      continue;
    }
    Fe zinv, zinv2, xm, ym, t;
    fe_mont_mul(fp, zinv, total_inv, prefix[ii]);
    fe_mont_mul(fp, total_inv, total_inv, pts[ii].Z);
    fe_mont_sq(fp, zinv2, zinv);
    fe_mont_mul(fp, xm, pts[ii].X, zinv2);
    fe_mont_mul(fp, t, zinv2, zinv);
    fe_mont_mul(fp, ym, pts[ii].Y, t);
    infs[ii] = 0;
    fe_from_mont(fp, xs[ii], xm);
    fe_from_mont(fp, ys[ii], ym);
  }
}

inline unsigned hw_threads() {
  unsigned t = std::thread::hardware_concurrency();
  return t == 0 ? 1 : t;
}

}  // namespace

extern "C" {

// ---------------- field batch ops ----------------
// All arrays are n*4 u64 little-endian canonical limbs.

void pasta_batch_mul(int fid, const u64* a, const u64* b, u64* out,
                     size_t n) {
  const FieldParams& fp = params(fid);
  for (size_t i = 0; i < n; ++i) {
    Fe am, bm, r;
    std::memcpy(am.v, a + 4 * i, 32);
    std::memcpy(bm.v, b + 4 * i, 32);
    fe_to_mont(fp, am, am);
    fe_to_mont(fp, bm, bm);
    fe_mont_mul(fp, r, am, bm);
    fe_from_mont(fp, r, r);
    std::memcpy(out + 4 * i, r.v, 32);
  }
}

void pasta_batch_add(int fid, const u64* a, const u64* b, u64* out,
                     size_t n) {
  const FieldParams& fp = params(fid);
  for (size_t i = 0; i < n; ++i) {
    Fe x, y, r;
    std::memcpy(x.v, a + 4 * i, 32);
    std::memcpy(y.v, b + 4 * i, 32);
    fe_add(fp, r, x, y);
    std::memcpy(out + 4 * i, r.v, 32);
  }
}

void pasta_batch_sub(int fid, const u64* a, const u64* b, u64* out,
                     size_t n) {
  const FieldParams& fp = params(fid);
  for (size_t i = 0; i < n; ++i) {
    Fe x, y, r;
    std::memcpy(x.v, a + 4 * i, 32);
    std::memcpy(y.v, b + 4 * i, 32);
    fe_sub(fp, r, x, y);
    std::memcpy(out + 4 * i, r.v, 32);
  }
}

// out = a + s*b (vector axpy with scalar s) — the IPA fold primitive.
void pasta_batch_axpy(int fid, const u64* a, const u64* b, const u64* s,
                      u64* out, size_t n) {
  const FieldParams& fp = params(fid);
  Fe sm;
  std::memcpy(sm.v, s, 32);
  fe_to_mont(fp, sm, sm);
  for (size_t i = 0; i < n; ++i) {
    Fe x, y, r;
    std::memcpy(x.v, a + 4 * i, 32);
    std::memcpy(y.v, b + 4 * i, 32);
    fe_to_mont(fp, y, y);
    fe_mont_mul(fp, r, y, sm);
    fe_from_mont(fp, r, r);
    fe_add(fp, r, r, x);
    std::memcpy(out + 4 * i, r.v, 32);
  }
}

// dot product <a, b> mod p
void pasta_scalar_dot(int fid, const u64* a, const u64* b, u64* out,
                      size_t n) {
  const FieldParams& fp = params(fid);
  Fe acc = {{0, 0, 0, 0}};
  for (size_t i = 0; i < n; ++i) {
    Fe x, y, r;
    std::memcpy(x.v, a + 4 * i, 32);
    std::memcpy(y.v, b + 4 * i, 32);
    fe_to_mont(fp, x, x);
    fe_mont_mul(fp, r, x, y);  // x*R * y * R^-1 = x*y (canonical)
    fe_add(fp, acc, acc, r);
  }
  std::memcpy(out, acc.v, 32);
}

void pasta_batch_inv(int fid, const u64* a, u64* out, size_t n) {
  const FieldParams& fp = params(fid);
  // Montgomery trick over canonical values (product chain in mont form)
  std::vector<Fe> vals(n), prefix(n + 1);
  prefix[0] = fp.r1;
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(vals[i].v, a + 4 * i, 32);
    fe_to_mont(fp, vals[i], vals[i]);
    if (fe_is_zero(vals[i])) {
      prefix[i + 1] = prefix[i];
    } else {
      fe_mont_mul(fp, prefix[i + 1], prefix[i], vals[i]);
    }
  }
  Fe ti;
  fe_mont_inv(fp, ti, prefix[n]);
  for (size_t ii = n; ii-- > 0;) {
    if (fe_is_zero(vals[ii])) {
      std::memset(out + 4 * ii, 0, 32);
      continue;
    }
    Fe r;
    fe_mont_mul(fp, r, ti, prefix[ii]);
    fe_mont_mul(fp, ti, ti, vals[ii]);
    fe_from_mont(fp, r, r);
    std::memcpy(out + 4 * ii, r.v, 32);
  }
}

// ---------------- NTT ----------------
// In-place in-order radix-2 NTT; root = primitive n-th root of unity
// (w for forward, w^{-1} for inverse pre-computed by caller is NOT needed:
// pass inverse flag and the forward root; we invert internally).
void pasta_ntt(int fid, u64* data, size_t n, const u64* root_in,
               int inverse) {
  const FieldParams& fp = params(fid);
  Fe w;
  std::memcpy(w.v, root_in, 32);
  fe_to_mont(fp, w, w);
  if (inverse) fe_mont_inv(fp, w, w);

  std::vector<Fe> a(n);
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(a[i].v, data + 4 * i, 32);
    fe_to_mont(fp, a[i], a[i]);
  }
  // bit-reverse permutation
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j |= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  // precompute roots: roots[k] = w^k for k < n/2
  std::vector<Fe> roots(n / 2 > 0 ? n / 2 : 1);
  roots[0] = fp.r1;
  for (size_t k = 1; k < n / 2; ++k) fe_mont_mul(fp, roots[k], roots[k - 1], w);

  for (size_t len = 2; len <= n; len <<= 1) {
    size_t half = len >> 1;
    size_t step = n / len;
    for (size_t start = 0; start < n; start += len) {
      size_t idx = 0;
      for (size_t k = start; k < start + half; ++k) {
        Fe u = a[k], v;
        fe_mont_mul(fp, v, a[k + half], roots[idx]);
        fe_add(fp, a[k], u, v);
        fe_sub(fp, a[k + half], u, v);
        idx += step;
      }
    }
  }
  if (inverse) {
    // multiply by n^{-1}
    Fe n_fe = {{(u64)n, 0, 0, 0}};
    fe_to_mont(fp, n_fe, n_fe);
    Fe n_inv;
    fe_mont_inv(fp, n_inv, n_fe);
    for (size_t i = 0; i < n; ++i) fe_mont_mul(fp, a[i], a[i], n_inv);
  }
  for (size_t i = 0; i < n; ++i) {
    fe_from_mont(fp, a[i], a[i]);
    std::memcpy(data + 4 * i, a[i].v, 32);
  }
}

// ---------------- EC batch ops ----------------
// Points as parallel arrays: xs/ys n*4 canonical limbs, infs n bytes.

// out_i = P_i + s * Q_i  (the IPA G-fold).  s: 4 limbs canonical.
void pasta_ec_fold(int curve, const u64* px, const u64* py,
                   const uint8_t* pinf, const u64* qx, const u64* qy,
                   const uint8_t* qinf, const u64* s, u64* ox, u64* oy,
                   uint8_t* oinf, size_t n) {
  CurveCtx c = curve_ctx(curve);
  const FieldParams& fp = *c.fp;
  u64 k[4];
  std::memcpy(k, s, 32);
  std::vector<Jac> res(n);

  unsigned nt = hw_threads() > 1 && n >= 64 ? 2 : 1;
  auto work = [&](size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i) {
      Jac Q;
      if (qinf[i]) {
        jac_set_inf(c, Q);
      } else {
        std::memcpy(Q.X.v, qx + 4 * i, 32);
        std::memcpy(Q.Y.v, qy + 4 * i, 32);
        fe_to_mont(fp, Q.X, Q.X);
        fe_to_mont(fp, Q.Y, Q.Y);
        Q.Z = fp.r1;
      }
      Jac sQ;
      jac_mul_u256(c, sQ, Q, k);
      Fe pxm, pym;
      if (!pinf[i]) {
        std::memcpy(pxm.v, px + 4 * i, 32);
        std::memcpy(pym.v, py + 4 * i, 32);
        fe_to_mont(fp, pxm, pxm);
        fe_to_mont(fp, pym, pym);
        jac_add_affine(c, res[i], sQ, pxm, pym, false);
      } else {
        res[i] = sQ;
      }
    }
  };
  if (nt == 2) {
    std::thread t1(work, 0, n / 2);
    work(n / 2, n);
    t1.join();
  } else {
    work(0, n);
  }
  std::vector<Fe> oxs(n), oys(n);
  batch_normalize(c, res, oxs.data(), oys.data(), oinf);
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(ox + 4 * i, oxs[i].v, 32);
    std::memcpy(oy + 4 * i, oys[i].v, 32);
  }
}

// batch scalar-mul: out_i = k_i * P_i
void pasta_ec_batch_mul(int curve, const u64* ks, const u64* xs,
                        const u64* ys, const uint8_t* infs, u64* ox, u64* oy,
                        uint8_t* oinf, size_t n) {
  CurveCtx c = curve_ctx(curve);
  const FieldParams& fp = *c.fp;
  std::vector<Jac> res(n);
  auto work = [&](size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i) {
      Jac P;
      if (infs[i]) {
        jac_set_inf(c, P);
      } else {
        std::memcpy(P.X.v, xs + 4 * i, 32);
        std::memcpy(P.Y.v, ys + 4 * i, 32);
        fe_to_mont(fp, P.X, P.X);
        fe_to_mont(fp, P.Y, P.Y);
        P.Z = fp.r1;
      }
      jac_mul_u256(c, res[i], P, ks + 4 * i);
    }
  };
  unsigned nt = hw_threads() > 1 && n >= 16 ? 2 : 1;
  if (nt == 2) {
    std::thread t1(work, 0, n / 2);
    work(n / 2, n);
    t1.join();
  } else {
    work(0, n);
  }
  std::vector<Fe> oxs(n), oys(n);
  batch_normalize(c, res, oxs.data(), oys.data(), oinf);
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(ox + 4 * i, oxs[i].v, 32);
    std::memcpy(oy + 4 * i, oys[i].v, 32);
  }
}

// Pippenger MSM.  scalars n*4 canonical limbs (< r); output one affine point.
void pasta_msm(int curve, const u64* scalars, const u64* xs, const u64* ys,
               const uint8_t* infs, size_t n, u64* ox, u64* oy,
               uint8_t* oinf) {
  CurveCtx c = curve_ctx(curve);
  const FieldParams& fp = *c.fp;
  if (n == 0) {
    *oinf = 1;
    std::memset(ox, 0, 32);
    std::memset(oy, 0, 32);
    return;
  }
  // window size ~ ln(n)
  unsigned w = 2;
  while ((1u << (w + 1)) < n && w < 16) ++w;
  unsigned nwin = (256 + w - 1) / w;

  // pre-convert points to Montgomery affine
  std::vector<Fe> pxm(n), pym(n);
  for (size_t i = 0; i < n; ++i) {
    std::memcpy(pxm[i].v, xs + 4 * i, 32);
    std::memcpy(pym[i].v, ys + 4 * i, 32);
    fe_to_mont(fp, pxm[i], pxm[i]);
    fe_to_mont(fp, pym[i], pym[i]);
  }

  std::vector<Jac> window_sums(nwin);
  auto window_work = [&](unsigned win_lo, unsigned win_hi) {
    std::vector<Jac> buckets((size_t)1 << w);
    for (unsigned win = win_lo; win < win_hi; ++win) {
      for (auto& b : buckets) jac_set_inf(c, b);
      unsigned shift = win * w;
      for (size_t i = 0; i < n; ++i) {
        if (infs[i]) continue;
        // extract digit = (scalar >> shift) & (2^w - 1)
        unsigned limb = shift / 64, off = shift % 64;
        u64 d = scalars[4 * i + limb] >> off;
        if (off + w > 64 && limb + 1 < 4)
          d |= scalars[4 * i + limb + 1] << (64 - off);
        d &= ((u64)1 << w) - 1;
        if (!d) continue;
        jac_add_affine(c, buckets[d], buckets[d], pxm[i], pym[i], false);
      }
      Jac running, acc;
      jac_set_inf(c, running);
      jac_set_inf(c, acc);
      for (size_t d = ((size_t)1 << w) - 1; d >= 1; --d) {
        jac_add(c, running, running, buckets[d]);
        jac_add(c, acc, acc, running);
      }
      window_sums[win] = acc;
    }
  };
  unsigned nt = hw_threads() > 1 && n >= 256 ? 2 : 1;
  if (nt == 2) {
    unsigned mid = nwin / 2;
    std::thread t1(window_work, 0, mid);
    window_work(mid, nwin);
    t1.join();
  } else {
    window_work(0, nwin);
  }
  Jac total;
  jac_set_inf(c, total);
  for (unsigned win = nwin; win-- > 0;) {
    for (unsigned b = 0; b < w; ++b) jac_double(c, total, total);
    jac_add(c, total, total, window_sums[win]);
  }
  std::vector<Jac> one = {total};
  Fe rx, ry;
  batch_normalize(c, one, &rx, &ry, oinf);
  std::memcpy(ox, rx.v, 32);
  std::memcpy(oy, ry.v, 32);
}

// ---------------- Poseidon ----------------
// 3-wide state, 55 full rounds: sbox x^7 -> MDS -> add round constants
// (reference crates/poseidon/src/inner_sponge.rs:3-49).  Constants are
// injected once per field from Python (they live in
// halo_tpu/poseidon/constants.py).

static Fe g_mds[2][9];
static Fe g_rc[2][55 * 3];
static bool g_pos_ready[2] = {false, false};

void pasta_poseidon_set_constants(int fid, const u64* mds,
                                  const u64* round_constants) {
  const FieldParams& fp = params(fid);
  for (int i = 0; i < 9; ++i) {
    std::memcpy(g_mds[fid][i].v, mds + 4 * i, 32);
    fe_to_mont(fp, g_mds[fid][i], g_mds[fid][i]);
  }
  for (int i = 0; i < 55 * 3; ++i) {
    std::memcpy(g_rc[fid][i].v, round_constants + 4 * i, 32);
    fe_to_mont(fp, g_rc[fid][i], g_rc[fid][i]);
  }
  g_pos_ready[fid] = true;
}

int pasta_poseidon_ready(int fid) { return g_pos_ready[fid] ? 1 : 0; }

// states: n*3*4 limbs, permuted in place.
void pasta_poseidon_permute(int fid, u64* states, size_t n) {
  const FieldParams& fp = params(fid);
  const Fe* mds = g_mds[fid];
  const Fe* rc = g_rc[fid];
  for (size_t s = 0; s < n; ++s) {
    Fe st[3];
    for (int i = 0; i < 3; ++i) {
      std::memcpy(st[i].v, states + 12 * s + 4 * i, 32);
      fe_to_mont(fp, st[i], st[i]);
    }
    for (int r = 0; r < 55; ++r) {
      Fe sb[3];
      for (int i = 0; i < 3; ++i) {
        Fe x2, x3, x6;
        fe_mont_sq(fp, x2, st[i]);
        fe_mont_mul(fp, x3, x2, st[i]);
        fe_mont_sq(fp, x6, x3);
        fe_mont_mul(fp, sb[i], x6, st[i]);
      }
      for (int i = 0; i < 3; ++i) {
        Fe acc = {{0, 0, 0, 0}}, t;
        for (int j = 0; j < 3; ++j) {
          fe_mont_mul(fp, t, mds[3 * i + j], sb[j]);
          fe_add(fp, acc, acc, t);
        }
        fe_add(fp, st[i], acc, rc[3 * r + i]);
      }
    }
    for (int i = 0; i < 3; ++i) {
      fe_from_mont(fp, st[i], st[i]);
      std::memcpy(states + 12 * s + 4 * i, st[i].v, 32);
    }
  }
}

int pasta_native_abi_version() { return 1; }

}  // extern "C"
