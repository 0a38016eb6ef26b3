// Automated native-tokenizer test: reads a flat vocab file and prompt lines
// on argv/stdin, prints id vectors (consumed by the pytest parity harness;
// the reference's version was interactive-only, test/test_tokenizer.cpp:9-19).
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>
#include <vector>

#include "sdtpu.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s ctokenizer.txt [context_len]\n", argv[0]);
    return 2;
  }
  int context_len = argc > 2 ? std::atoi(argv[2]) : 77;
  sdtpu_tokenizer* tok = nullptr;
  int st = sdtpu_tokenizer_create(argv[1], &tok);
  if (st != SDTPU_NO_ERROR) {
    std::fprintf(stderr, "create failed: %s (%s)\n",
                 sdtpu_get_error_description(st),
                 sdtpu_get_last_error_extra_info(st, nullptr));
    return 1;
  }
  int32_t vs = 0;
  sdtpu_tokenizer_vocab_size(tok, &vs);
  std::fprintf(stderr, "vocab_size=%d\n", vs);
  std::string line;
  std::vector<int32_t> ids(context_len);
  while (std::getline(std::cin, line)) {
    st = sdtpu_tokenizer_tokenize(tok, line.c_str(), context_len, ids.data());
    if (st != SDTPU_NO_ERROR) {
      std::printf("ERROR %d\n", st);
      continue;
    }
    for (int i = 0; i < context_len; ++i)
      std::printf("%d%c", ids[i], i + 1 == context_len ? '\n' : ' ');
  }
  sdtpu_tokenizer_release(tok);
  return 0;
}
