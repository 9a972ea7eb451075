// oracle: load model, prefill token ids, then greedy-generate N tokens
// with clean llama_decode semantics. Prints one token id per line.
#include "llama.h"
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <algorithm>
int main(int argc, char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s model.gguf N id id...\n", argv[0]); return 1; }
    llama_backend_init(false);
    llama_model_params mp = llama_model_default_params();
    llama_model* model = llama_load_model_from_file(argv[1], mp);
    if (!model) return 2;
    llama_context_params cp = llama_context_default_params();
    cp.f16_kv = false;
    cp.n_ctx = 256;
    llama_context* ctx = llama_new_context_with_model(model, cp);
    int n_gen = atoi(argv[2]);
    std::vector<llama_token> toks;
    for (int i = 3; i < argc; i++) toks.push_back(atoi(argv[i]));
    llama_batch b = llama_batch_init(256, 0, 4);
    for (size_t i = 0; i < toks.size(); i++) {
        b.token[i] = toks[i]; b.pos[i] = i; b.n_seq_id[i] = 1; b.seq_id[i][0] = 0;
        b.logits[i] = i + 1 == toks.size();
    }
    b.n_tokens = toks.size();
    if (llama_decode(ctx, b)) return 3;
    int n_past = toks.size();
    int n = llama_n_vocab(model);
    for (int g = 0; g < n_gen; g++) {
        float* lg = llama_get_logits_ith(ctx, b.n_tokens - 1);
        int best = 0;
        for (int i = 1; i < n; i++) if (lg[i] > lg[best]) best = i;
        printf("%d\n", best);
        b.n_tokens = 1;
        b.token[0] = best; b.pos[0] = n_past; b.n_seq_id[0] = 1; b.seq_id[0][0] = 0;
        b.logits[0] = true;
        if (llama_decode(ctx, b)) return 4;
        n_past++;
    }
    return 0;
}
