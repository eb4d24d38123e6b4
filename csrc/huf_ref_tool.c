/* huf_ref_tool — canonical-implementation HUF codec for compatibility tests.
 *
 * The reference library (zipnn v0.5.3) entropy-codes every plane chunk with
 * HUF_compress / HUF_decompress from Yann Collet's FiniteStateEntropy
 * library (called at reference csrc/zipnn_core.c:366 and :807; the vendored
 * submodule is empty in the snapshot, see reference setup.py:24-30).  That
 * library lives on inside zstd — same wire format, same canonical-code and
 * 4-stream conventions — so linking the system libzstd.a's internal HUF
 * entry points gives us a true independent implementation to test against:
 *
 *   huf_ref_tool c           < raw   > block   (emulates HUF_compress:
 *                                              tableLog<=11 default, RLE and
 *                                              not-compressible sentinels)
 *   huf_ref_tool d ORIGSIZE  < block > raw     (HUF_decompress, 4X)
 *
 * Exit codes: 0 ok; 2 "not compressible" (compress only); 1 error.
 * Used by tests/ref_huf.py to (a) generate golden fixtures our decoders
 * must decode bit-exactly and (b) verify blocks from our encoder parse and
 * decode through the canonical decoder.
 *
 * The internal prototypes below match zstd 1.5.4 (the system library:
 * libzstd.so.1.5.4).  Where 1.5.x merged the *_bmi2 variants into the main
 * entry points we pass a trailing 0 ("portable path"); under the SysV ABI a
 * surplus trailing int is ignored by older signatures, so this also links
 * and runs against nearby versions.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef unsigned U32;
typedef size_t HUF_CElt; /* zstd >= 1.5.0 */
typedef U32 HUF_DTable;

/* ---- internal libzstd entry points (lib/common/huf.h, hist.h, fse.h) ---- */
extern unsigned HIST_count_simple(unsigned *count, unsigned *maxSymbolValuePtr,
                                  const void *src, size_t srcSize);
extern unsigned FSE_optimalTableLog_internal(unsigned maxTableLog, size_t srcSize,
                                             unsigned maxSymbolValue, unsigned minus);
extern size_t HUF_buildCTable_wksp(HUF_CElt *tree, const unsigned *count,
                                   U32 maxSymbolValue, U32 maxNbBits,
                                   void *workSpace, size_t wkspSize);
extern size_t HUF_writeCTable_wksp(void *dst, size_t maxDstSize,
                                   const HUF_CElt *CTable, unsigned maxSymbolValue,
                                   unsigned huffLog, void *workspace,
                                   size_t workspaceSize);
extern size_t HUF_compress4X_usingCTable(void *dst, size_t dstSize,
                                         const void *src, size_t srcSize,
                                         const HUF_CElt *CTable, int bmi2);
extern size_t HUF_decompress4X_hufOnly_wksp(HUF_DTable *dctx, void *dst,
                                            size_t dstSize, const void *cSrc,
                                            size_t cSrcSize, void *workSpace,
                                            size_t wkspSize, int bmi2);
extern unsigned HUF_isError(size_t code);
extern const char *HUF_getErrorName(size_t code);

#define HUF_TABLELOG_DEFAULT 11
#define MAX_SRC (128 * 1024) /* HUF_BLOCKSIZE_MAX, the fp8 chunk-cap driver */
#define WKSP_BYTES (1 << 20)

static unsigned char inbuf[MAX_SRC + 16];
static unsigned char outbuf[2 * MAX_SRC + 4096];
static unsigned char wksp[WKSP_BYTES] __attribute__((aligned(8)));

static size_t read_all(unsigned char *buf, size_t cap) {
    size_t n = 0, r;
    while (n < cap && (r = fread(buf + n, 1, cap - n, stdin)) > 0) n += r;
    return n;
}

static int do_compress(void) {
    size_t srcSize = read_all(inbuf, sizeof(inbuf));
    if (srcSize == 0 || srcSize > MAX_SRC) {
        fprintf(stderr, "src size %zu out of range\n", srcSize);
        return 1;
    }
    unsigned count[256];
    unsigned maxSV = 255;
    unsigned largest = HIST_count_simple(count, &maxSV, inbuf, srcSize);
    if (largest == srcSize) { /* RLE: canonical 1-byte output */
        fputc(inbuf[0], stdout);
        return 0;
    }
    if (largest <= (srcSize >> 7) + 4) return 2; /* not compressible */
    unsigned tableLog =
        FSE_optimalTableLog_internal(HUF_TABLELOG_DEFAULT, srcSize, maxSV, 1);
    static HUF_CElt ct[257];
    memset(ct, 0, sizeof(ct));
    size_t maxNbBits =
        HUF_buildCTable_wksp(ct, count, maxSV, tableLog, wksp, WKSP_BYTES);
    if (HUF_isError(maxNbBits)) {
        fprintf(stderr, "buildCTable: %s\n", HUF_getErrorName(maxNbBits));
        return 1;
    }
    size_t hSize = HUF_writeCTable_wksp(outbuf, sizeof(outbuf), ct, maxSV,
                                        (unsigned)maxNbBits, wksp, WKSP_BYTES);
    if (HUF_isError(hSize)) {
        fprintf(stderr, "writeCTable: %s\n", HUF_getErrorName(hSize));
        return 1;
    }
    if (hSize + 12 >= srcSize) return 2;
    size_t cSize = HUF_compress4X_usingCTable(outbuf + hSize, sizeof(outbuf) - hSize,
                                              inbuf, srcSize, ct, 0);
    if (HUF_isError(cSize)) {
        fprintf(stderr, "compress4X: %s\n", HUF_getErrorName(cSize));
        return 1;
    }
    if (cSize == 0 || hSize + cSize >= srcSize - 1) return 2;
    fwrite(outbuf, 1, hSize + cSize, stdout);
    return 0;
}

static int do_decompress(const char *arg) {
    long orig = strtol(arg, NULL, 10);
    if (orig <= 0 || orig > MAX_SRC) {
        fprintf(stderr, "bad orig size\n");
        return 1;
    }
    size_t cSize = read_all(inbuf, sizeof(inbuf));
    static HUF_DTable dtable[1 + (1 << 12)];
    dtable[0] = (HUF_DTable)12 * 0x01000001; /* maxTableLog=12 descriptor */
    size_t r = HUF_decompress4X_hufOnly_wksp(dtable, outbuf, (size_t)orig, inbuf,
                                             cSize, wksp, WKSP_BYTES, 0);
    if (HUF_isError(r)) {
        fprintf(stderr, "decompress4X: %s\n", HUF_getErrorName(r));
        return 1;
    }
    fwrite(outbuf, 1, (size_t)orig, stdout);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && strcmp(argv[1], "c") == 0) return do_compress();
    if (argc >= 3 && strcmp(argv[1], "d") == 0) return do_decompress(argv[2]);
    fprintf(stderr, "usage: %s c < raw > block | %s d ORIGSIZE < block > raw\n",
            argv[0], argv[0]);
    return 1;
}
