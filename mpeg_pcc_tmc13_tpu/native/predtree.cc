// Predictive-geometry chain reconstruction (decoder hot loop).
//
// The encoder (models/geometry_predictive.py) vectorises fully because
// lossless chain prediction reads original positions; the decoder's
// recurrence p[i] = f(mode, p[i-1], p[i-2], p[i-3]) + r[i] is serial by
// nature (reference decodePredictiveGeometry walks the tree the same
// way, geometry_predictive_decoder.cpp:736) — this native loop runs it
// at memory speed.

#include <cstdint>

extern "C" {

// modes: 0 = none (absolute), 1 = delta, 2 = linear2, 3 = linear3
// (reference GPredicter::Mode, geometry_predictive.h:54-60)
void predchain_recon(const int64_t* res, const uint8_t* modes,
                     int64_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      int64_t p = 0;
      switch (modes[i]) {
        case 1:
          p = out[(i - 1) * 3 + c];
          break;
        case 2:
          p = 2 * out[(i - 1) * 3 + c] - out[(i - 2) * 3 + c];
          break;
        case 3:
          p = out[(i - 1) * 3 + c] + out[(i - 2) * 3 + c]
              - out[(i - 3) * 3 + c];
          break;
        default:
          break;
      }
      out[i * 3 + c] = p + res[i * 3 + c];
    }
  }
}

}  // extern "C"
