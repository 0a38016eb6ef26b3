// Automated native-DPM test: prints schedule tables + an update trace for a
// given step count (consumed by the pytest parity harness; the reference's
// version was interactive, test/test_dpm.cpp:26-53).
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "sdtpu.h"

int main(int argc, char** argv) {
  int steps = argc > 1 ? std::atoi(argv[1]) : 20;
  sdtpu_dpm* s = nullptr;
  if (sdtpu_dpm_create(1000, 0.00085, 0.0120, &s) != SDTPU_NO_ERROR) return 1;
  if (sdtpu_dpm_prepare(s, steps) != SDTPU_NO_ERROR) return 1;
  std::vector<float> mts(steps);
  sdtpu_dpm_model_ts(s, mts.data(), steps);
  std::printf("model_ts");
  for (float v : mts) std::printf(" %.6f", v);
  std::printf("\n");

  // deterministic update trace over a 5-element vector
  std::vector<float> x = {1.0f, -0.5f, 0.25f, 2.0f, -1.5f};
  for (int i = 0; i < steps; ++i) {
    std::vector<float> eps(5);
    for (int j = 0; j < 5; ++j) eps[j] = 0.1f * float(j - 2) + 0.01f * i;
    if (sdtpu_dpm_update(s, i, x.data(), eps.data(), 5) != SDTPU_NO_ERROR)
      return 1;
    std::printf("step %d", i);
    for (float v : x) std::printf(" %.6f", v);
    std::printf("\n");
  }
  sdtpu_dpm_release(s);
  return 0;
}
