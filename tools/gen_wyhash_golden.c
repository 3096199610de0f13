#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include "wyhash_v5.h"

static uint64_t hash_combine(uint64_t combined, uint64_t hash) {
    combined ^= hash + 0x517cc1b727220a95ULL + (combined << 6) + (combined >> 2);
    return combined;
}

int main(void) {
    /* inputs chosen to hit every length branch: 0,1,2,3 (wyr3), 4..7
       (wyr4 pair), 8..16, 17..32, 33..64, 65..128, 129+ (loop) */
    const char *base =
        "The quick brown fox jumps over the lazy dog, 0123456789 times; "
        "pack my box with five dozen liquor jugs and sphinx of black quartz judges vow!";
    int lens[] = {0,1,2,3,4,5,7,8,9,15,16,17,24,31,32,33,47,48,63,64,65,
                  80,96,127,128,129,130};
    printf("{\n  \"wyhash_seed0\": {\n");
    for (unsigned i = 0; i < sizeof(lens)/sizeof(lens[0]); i++) {
        printf("    \"%d\": \"%llu\"%s\n", lens[i],
               (unsigned long long) wyhash(base, lens[i], 0, _wyp),
               i + 1 < sizeof(lens)/sizeof(lens[0]) ? "," : "");
    }
    printf("  },\n  \"wyhash_seed42\": {\n");
    for (unsigned i = 0; i < sizeof(lens)/sizeof(lens[0]); i++) {
        printf("    \"%d\": \"%llu\"%s\n", lens[i],
               (unsigned long long) wyhash(base, lens[i], 42, _wyp),
               i + 1 < sizeof(lens)/sizeof(lens[0]) ? "," : "");
    }
    /* token-style inputs: what index.cpp:520 / collection.cpp:1985 hash */
    const char *toks[] = {"exhaustive", "rocks", "a", "z2", "the",
                          "\xc3\xa9t\xc3\xa9", "samuel l. jackson",
                          "1577836800", "loughnane"};
    printf("  },\n  \"tokens\": {\n");
    for (unsigned i = 0; i < sizeof(toks)/sizeof(toks[0]); i++) {
        printf("    \"%s\": \"%llu\"%s\n", toks[i],
               (unsigned long long) wyhash(toks[i], strlen(toks[i]), 0, _wyp),
               i + 1 < sizeof(toks)/sizeof(toks[0]) ? "," : "");
    }
    /* hash_combine chain over the token hashes (include/index.h:231) */
    uint64_t comb = 1;
    printf("  },\n  \"hash_combine_chain\": [\n");
    for (unsigned i = 0; i < sizeof(toks)/sizeof(toks[0]); i++) {
        comb = hash_combine(comb, wyhash(toks[i], strlen(toks[i]), 0, _wyp));
        printf("    \"%llu\"%s\n", (unsigned long long) comb,
               i + 1 < sizeof(toks)/sizeof(toks[0]) ? "," : "");
    }
    printf("  ],\n  \"wyhash64\": [\n");
    uint64_t abpairs[4][2] = {{0,0},{1,2},{0xffffffffffffffffULL, 1},
                              {0x123456789abcdefULL, 0xfedcba987654321ULL}};
    for (int i = 0; i < 4; i++)
        printf("    \"%llu\"%s\n",
               (unsigned long long) wyhash64(abpairs[i][0], abpairs[i][1]),
               i < 3 ? "," : "");
    printf("  ]\n}\n");
    return 0;
}
