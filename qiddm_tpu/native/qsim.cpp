// qsim — native C++ statevector / density-matrix simulator.
//
// The reference delegates its circuit execution to external native engines
// (PennyLane-Lightning's C++ statevector, qiskit-aer; SURVEY §2 native
// components). This is the framework's own native engine: an independent,
// deliberately simple gate-stream interpreter used as
//   * a cross-validation oracle for the TPU (JAX/XLA) simulator,
//   * the shot-sampling backend for the QASM bridge (aer analogue),
//   * a host-side fallback when no accelerator is available.
//
// Conventions match qiddm_tpu.sim: wire 0 is the most significant bit;
// RZ(t) = diag(e^{-it/2}, e^{it/2}); Rot(phi,theta,omega) = RZ(omega) RY(theta) RZ(phi).
//
// Build: g++ -O3 -shared -fPIC -o libqsim.so qsim.cpp

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

using cplx = std::complex<double>;

enum OpKind : int32_t {
  OP_RX = 0,
  OP_RY = 1,
  OP_RZ = 2,
  OP_ROT = 3,       // p0=phi, p1=theta, p2=omega
  OP_CZ = 4,        // wire=control, wire2=target
  OP_CNOT = 5,      // wire=control, wire2=target
  OP_PHASESHIFT = 6,        // p0=phi
  OP_CH_PHASE_DAMP = 7,     // p0=gamma (density mode only)
  OP_CH_AMP_DAMP = 8,       // p0=gamma (density mode only)
  OP_CH_DEPOL = 9,          // p0=p     (density mode only)
};

struct Op {
  int32_t kind;
  int32_t wire;
  int32_t wire2;
  double p0, p1, p2;
};

namespace {

inline void gate2x2(int kind, double p0, double p1, double p2, cplx g[2][2]) {
  switch (kind) {
    case OP_RX: {
      double c = std::cos(p0 / 2), s = std::sin(p0 / 2);
      g[0][0] = c; g[0][1] = cplx(0, -s);
      g[1][0] = cplx(0, -s); g[1][1] = c;
      break;
    }
    case OP_RY: {
      double c = std::cos(p0 / 2), s = std::sin(p0 / 2);
      g[0][0] = c; g[0][1] = -s;
      g[1][0] = s; g[1][1] = c;
      break;
    }
    case OP_RZ: {
      g[0][0] = std::exp(cplx(0, -p0 / 2)); g[0][1] = 0;
      g[1][0] = 0; g[1][1] = std::exp(cplx(0, p0 / 2));
      break;
    }
    case OP_ROT: {
      double phi = p0, theta = p1, omega = p2;
      double c = std::cos(theta / 2), s = std::sin(theta / 2);
      g[0][0] = std::exp(cplx(0, -(phi + omega) / 2)) * c;
      g[0][1] = -std::exp(cplx(0, (phi - omega) / 2)) * s;
      g[1][0] = std::exp(cplx(0, -(phi - omega) / 2)) * s;
      g[1][1] = std::exp(cplx(0, (phi + omega) / 2)) * c;
      break;
    }
    case OP_PHASESHIFT: {
      g[0][0] = 1; g[0][1] = 0;
      g[1][0] = 0; g[1][1] = std::exp(cplx(0, p0));
      break;
    }
    default:
      g[0][0] = 1; g[0][1] = 0; g[1][0] = 0; g[1][1] = 1;
  }
}

inline void apply_1q(std::vector<cplx>& st, int wires, int wire,
                     const cplx g[2][2]) {
  const int64_t dim = int64_t(1) << wires;
  const int64_t bit = int64_t(1) << (wires - 1 - wire);
  for (int64_t i = 0; i < dim; ++i) {
    if (i & bit) continue;
    const cplx a = st[i], b = st[i | bit];
    st[i] = g[0][0] * a + g[0][1] * b;
    st[i | bit] = g[1][0] * a + g[1][1] * b;
  }
}

inline void apply_cz(std::vector<cplx>& st, int wires, int c, int t) {
  const int64_t dim = int64_t(1) << wires;
  const int64_t cb = int64_t(1) << (wires - 1 - c);
  const int64_t tb = int64_t(1) << (wires - 1 - t);
  for (int64_t i = 0; i < dim; ++i)
    if ((i & cb) && (i & tb)) st[i] = -st[i];
}

inline void apply_cnot(std::vector<cplx>& st, int wires, int c, int t) {
  const int64_t dim = int64_t(1) << wires;
  const int64_t cb = int64_t(1) << (wires - 1 - c);
  const int64_t tb = int64_t(1) << (wires - 1 - t);
  for (int64_t i = 0; i < dim; ++i) {
    if ((i & cb) && !(i & tb)) {
      std::swap(st[i], st[i | tb]);
    }
  }
}

// density-matrix helpers -----------------------------------------------------

inline void dm_apply_1q(std::vector<cplx>& rho, int wires, int wire,
                        const cplx g[2][2]) {
  // rho' = G rho G^dagger : apply G to rows then G* to columns.
  const int64_t dim = int64_t(1) << wires;
  const int64_t bit = int64_t(1) << (wires - 1 - wire);
  for (int64_t col = 0; col < dim; ++col)
    for (int64_t i = 0; i < dim; ++i) {
      if (i & bit) continue;
      const cplx a = rho[i * dim + col], b = rho[(i | bit) * dim + col];
      rho[i * dim + col] = g[0][0] * a + g[0][1] * b;
      rho[(i | bit) * dim + col] = g[1][0] * a + g[1][1] * b;
    }
  for (int64_t row = 0; row < dim; ++row)
    for (int64_t j = 0; j < dim; ++j) {
      if (j & bit) continue;
      const cplx a = rho[row * dim + j], b = rho[row * dim + (j | bit)];
      rho[row * dim + j] = std::conj(g[0][0]) * a + std::conj(g[0][1]) * b;
      rho[row * dim + (j | bit)] = std::conj(g[1][0]) * a + std::conj(g[1][1]) * b;
    }
}

inline void dm_apply_kraus(std::vector<cplx>& rho, int wires, int wire,
                           const cplx ks[][2][2], int nk) {
  const int64_t dim = int64_t(1) << wires;
  std::vector<cplx> acc(dim * dim, cplx(0, 0));
  std::vector<cplx> tmp(dim * dim);
  for (int k = 0; k < nk; ++k) {
    tmp = rho;
    dm_apply_1q(tmp, wires, wire, ks[k]);
    for (int64_t i = 0; i < dim * dim; ++i) acc[i] += tmp[i];
  }
  rho = std::move(acc);
}

inline void dm_channel(std::vector<cplx>& rho, int wires, int wire, int kind,
                       double p) {
  if (kind == OP_CH_PHASE_DAMP) {
    cplx ks[2][2][2] = {{{1, 0}, {0, std::sqrt(1 - p)}},
                        {{0, 0}, {0, std::sqrt(p)}}};
    dm_apply_kraus(rho, wires, wire, ks, 2);
  } else if (kind == OP_CH_AMP_DAMP) {
    cplx ks[2][2][2] = {{{1, 0}, {0, std::sqrt(1 - p)}},
                        {{0, std::sqrt(p)}, {0, 0}}};
    dm_apply_kraus(rho, wires, wire, ks, 2);
  } else if (kind == OP_CH_DEPOL) {
    double s = std::sqrt(p / 3.0);
    cplx ks[4][2][2] = {
        {{std::sqrt(1 - p), 0}, {0, std::sqrt(1 - p)}},
        {{0, s}, {s, 0}},
        {{0, cplx(0, -s)}, {cplx(0, s), 0}},
        {{s, 0}, {0, -s}},
    };
    dm_apply_kraus(rho, wires, wire, ks, 4);
  }
}

}  // namespace

extern "C" {

// Run a gate stream on a statevector. init_amps (len 2^wires interleaved
// re/im) may be null for |0..0>. Channel ops are rejected (return -1).
// Outputs: out_state (2*2^wires doubles) may be null; out_probs (2^wires)
// may be null; out_expvals (wires) may be null.
int qsim_statevector_run(int wires, const Op* ops, int n_ops,
                         const double* init_amps, double* out_state,
                         double* out_probs, double* out_expvals) {
  const int64_t dim = int64_t(1) << wires;
  std::vector<cplx> st(dim, cplx(0, 0));
  if (init_amps) {
    for (int64_t i = 0; i < dim; ++i)
      st[i] = cplx(init_amps[2 * i], init_amps[2 * i + 1]);
  } else {
    st[0] = 1.0;
  }
  for (int o = 0; o < n_ops; ++o) {
    const Op& op = ops[o];
    switch (op.kind) {
      case OP_CZ: apply_cz(st, wires, op.wire, op.wire2); break;
      case OP_CNOT: apply_cnot(st, wires, op.wire, op.wire2); break;
      case OP_CH_PHASE_DAMP:
      case OP_CH_AMP_DAMP:
      case OP_CH_DEPOL:
        return -1;  // channels need the density-matrix entry point
      default: {
        cplx g[2][2];
        gate2x2(op.kind, op.p0, op.p1, op.p2, g);
        apply_1q(st, wires, op.wire, g);
      }
    }
  }
  if (out_state)
    for (int64_t i = 0; i < dim; ++i) {
      out_state[2 * i] = st[i].real();
      out_state[2 * i + 1] = st[i].imag();
    }
  if (out_probs)
    for (int64_t i = 0; i < dim; ++i) out_probs[i] = std::norm(st[i]);
  if (out_expvals) {
    for (int w = 0; w < wires; ++w) {
      const int64_t bit = int64_t(1) << (wires - 1 - w);
      double e = 0;
      for (int64_t i = 0; i < dim; ++i)
        e += ((i & bit) ? -1.0 : 1.0) * std::norm(st[i]);
      out_expvals[w] = e;
    }
  }
  return 0;
}

// Density-matrix run (supports channel ops). init_amps as above (pure-state
// init). out_probs = diagonal; out_expvals = PauliZ per wire.
int qsim_density_run(int wires, const Op* ops, int n_ops,
                     const double* init_amps, double* out_probs,
                     double* out_expvals) {
  const int64_t dim = int64_t(1) << wires;
  std::vector<cplx> st(dim, cplx(0, 0));
  if (init_amps) {
    for (int64_t i = 0; i < dim; ++i)
      st[i] = cplx(init_amps[2 * i], init_amps[2 * i + 1]);
  } else {
    st[0] = 1.0;
  }
  std::vector<cplx> rho(dim * dim);
  for (int64_t i = 0; i < dim; ++i)
    for (int64_t j = 0; j < dim; ++j)
      rho[i * dim + j] = st[i] * std::conj(st[j]);

  for (int o = 0; o < n_ops; ++o) {
    const Op& op = ops[o];
    switch (op.kind) {
      case OP_CZ: {
        // diagonal: rho_ij *= z_i z_j
        const int64_t cb = int64_t(1) << (wires - 1 - op.wire);
        const int64_t tb = int64_t(1) << (wires - 1 - op.wire2);
        for (int64_t i = 0; i < dim; ++i)
          for (int64_t j = 0; j < dim; ++j) {
            double zi = ((i & cb) && (i & tb)) ? -1.0 : 1.0;
            double zj = ((j & cb) && (j & tb)) ? -1.0 : 1.0;
            rho[i * dim + j] *= zi * zj;
          }
        break;
      }
      case OP_CNOT: {
        const int64_t cb = int64_t(1) << (wires - 1 - op.wire);
        const int64_t tb = int64_t(1) << (wires - 1 - op.wire2);
        auto f = [&](int64_t i) {
          return (i & cb) ? (i ^ tb) : i;
        };
        std::vector<cplx> nr(dim * dim);
        for (int64_t i = 0; i < dim; ++i)
          for (int64_t j = 0; j < dim; ++j)
            nr[f(i) * dim + f(j)] = rho[i * dim + j];
        rho = std::move(nr);
        break;
      }
      case OP_CH_PHASE_DAMP:
      case OP_CH_AMP_DAMP:
      case OP_CH_DEPOL:
        dm_channel(rho, wires, op.wire, op.kind, op.p0);
        break;
      default: {
        cplx g[2][2];
        gate2x2(op.kind, op.p0, op.p1, op.p2, g);
        dm_apply_1q(rho, wires, op.wire, g);
      }
    }
  }
  if (out_probs)
    for (int64_t i = 0; i < dim; ++i) out_probs[i] = rho[i * dim + i].real();
  if (out_expvals)
    for (int w = 0; w < wires; ++w) {
      const int64_t bit = int64_t(1) << (wires - 1 - w);
      double e = 0;
      for (int64_t i = 0; i < dim; ++i)
        e += ((i & bit) ? -1.0 : 1.0) * rho[i * dim + i].real();
      out_expvals[w] = e;
    }
  return 0;
}

// Multinomial shot sampling from a probability vector (aer analogue).
int qsim_sample_counts(const double* probs, int64_t dim, int64_t shots,
                       uint64_t seed, int64_t* out_counts) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::vector<double> cdf(dim);
  double acc = 0;
  for (int64_t i = 0; i < dim; ++i) {
    acc += probs[i] > 0 ? probs[i] : 0;
    cdf[i] = acc;
  }
  std::memset(out_counts, 0, sizeof(int64_t) * dim);
  for (int64_t s = 0; s < shots; ++s) {
    double r = uni(rng) * acc;
    int64_t lo = 0, hi = dim - 1;
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (cdf[mid] < r) lo = mid + 1; else hi = mid;
    }
    out_counts[lo] += 1;
  }
  return 0;
}

}  // extern "C"
