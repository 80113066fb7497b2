// hakai_native — C++ host-side runtime helpers.
//
// The reference's only native component is a CUDA contact kernel
// (HAKAI_j.jl:2899-3157); on TPU that role is played by Pallas kernels.
// What remains host-side and hot is IO: parsing multi-MB Abaqus decks and
// serializing 100 ASCII-VTK frames per run (HAKAI_j.jl:3517-3717).  These
// helpers provide C-speed number parsing/formatting, loaded via ctypes with
// a pure-Python fallback (see hakai_tpu/io/native.py).
//
// Build: make -C native    (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// Parse every number in the buffer (separators: anything that's not part of
// a float literal). Returns count written, or -1 on overflow.
int64_t hakai_parse_numbers(const char* s, int64_t n, double* out,
                            int64_t cap) {
    int64_t count = 0;
    const char* p = s;
    const char* end = s + n;
    while (p < end) {
        char c = *p;
        if ((c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.') {
            char* next = nullptr;
            double v = strtod(p, &next);
            if (next != p) {
                if (count >= cap) return -1;
                out[count++] = v;
                p = next;
                continue;
            }
        }
        ++p;
    }
    return count;
}

// Format rows x cols doubles as "%1.6e" space-separated rows with trailing
// newlines (the reference's VTK number format, HAKAI_j.jl:3574).
// Returns bytes written, or -1 on overflow.
int64_t hakai_format_e(const double* v, int64_t rows, int64_t cols,
                       char* out, int64_t cap) {
    char* q = out;
    char* qend = out + cap;
    for (int64_t r = 0; r < rows; ++r) {
        for (int64_t c = 0; c < cols; ++c) {
            if (qend - q < 32) return -1;
            int len = snprintf(q, 32, "%1.6e", v[r * cols + c]);
            q += len;
            *q++ = (c + 1 == cols) ? '\n' : ' ';
        }
    }
    return q - out;
}

// Format rows x cols int32 rows (VTK CELLS lines).
int64_t hakai_format_i(const int32_t* v, int64_t rows, int64_t cols,
                       char* out, int64_t cap) {
    char* q = out;
    char* qend = out + cap;
    for (int64_t r = 0; r < rows; ++r) {
        for (int64_t c = 0; c < cols; ++c) {
            if (qend - q < 16) return -1;
            int len = snprintf(q, 16, "%d", v[r * cols + c]);
            q += len;
            *q++ = (c + 1 == cols) ? '\n' : ' ';
        }
    }
    return q - out;
}

}  // extern "C"
