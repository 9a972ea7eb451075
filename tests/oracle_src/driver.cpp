// tokenizer oracle driver: loads a vocab-only gguf, tokenizes stdin lines,
// prints token ids. Not shipped; test-only oracle.
#include "llama.h"
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <iostream>
int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s vocab.gguf [add_bos]\n", argv[0]); return 1; }
    llama_backend_init(false);
    llama_model_params mp = llama_model_default_params();
    mp.vocab_only = true;
    llama_model* model = llama_load_model_from_file(argv[1], mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    llama_context_params cp = llama_context_default_params();
    llama_context* ctx = llama_new_context_with_model(model, cp);
    bool add_bos = argc > 2 && atoi(argv[2]) != 0;
    std::string line;
    while (std::getline(std::cin, line)) {
        std::vector<llama_token> toks(line.size() + 16);
        int n = llama_tokenize(model, line.c_str(), line.size(), toks.data(), toks.size(), add_bos, false);
        for (int i = 0; i < n; i++) printf("%d ", toks[i]);
        printf("\n");
        fflush(stdout);
    }
    return 0;
}
