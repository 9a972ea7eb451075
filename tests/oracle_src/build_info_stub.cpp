// build-info symbols required by common.cpp (oracle single-rank build)
int LLAMA_BUILD_NUMBER = 0;
char const *LLAMA_COMMIT = "oracle";
char const *LLAMA_COMPILER = "g++";
char const *LLAMA_BUILD_TARGET = "oracle";
