/* _chash — C fast path for ISO 32000-2 Algorithm 2.B (crypt.hash_2b).
 *
 * The R6 password hash iterates {SHA-256/384/512 + AES-128-CBC over a
 * 64x-repeated buffer} at least 64 times — a KDF that is intentionally
 * slow, and ~3 ms/call in pure Python almost entirely from per-
 * iteration cipher-context churn. This module runs the whole loop in
 * C on OpenSSL EVP (the same primitives the `cryptography` package
 * wraps), ~100x faster, with bit-identical output enforced by
 * tests/test_ctok_parity.py::test_chash_parity.
 *
 * Optional: compiled on demand by kernel/ctok.py (needs gcc + system
 * libcrypto headers); any failure keeps the pure-Python hash_2b.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <limits.h>
#include <openssl/evp.h>
#include <string.h>

/* pwd <=127 (spec truncation upstream), k <=64, udata <=48 */
#define MAX_K1 ((127 + 64 + 48) * 64)

/* OpenSSL 3: explicit one-time fetches — the legacy EVP_aes_128_cbc()
 * constants trigger an implicit provider fetch on EVERY init, which
 * dominates a loop this tight (~10 us per fetch x ~200 inits/call) */
static EVP_CIPHER *g_aes, *g_aes256;
static EVP_MD *g_sha256, *g_sha384, *g_sha512;

static PyObject *
chash_hash_2b(PyObject *self, PyObject *args)
{
    const unsigned char *pwd, *salt, *udata;
    Py_ssize_t plen, slen, ulen;
    unsigned char k[64];
    unsigned int klen = 0;
    unsigned char seed[127 + 8 + 48];
    unsigned char k1[MAX_K1], e[MAX_K1];
    int i, rounds;

    (void)self;
    if (!PyArg_ParseTuple(args, "y#y#y#", &pwd, &plen, &salt, &slen, &udata,
                          &ulen))
        return NULL;
    if (plen > 127 || slen > 8 || ulen > 48) {
        PyErr_SetString(PyExc_ValueError, "hash_2b input too long");
        return NULL;
    }

    /* k = SHA256(pwd + salt + udata) */
    memcpy(seed, pwd, plen);
    memcpy(seed + plen, salt, slen);
    memcpy(seed + plen + slen, udata, ulen);
    if (!EVP_Digest(seed, plen + slen + ulen, k, &klen, g_sha256, NULL)) {
        PyErr_SetString(PyExc_RuntimeError, "EVP_Digest failed");
        return NULL;
    }

    {
        EVP_CIPHER_CTX *ctx = EVP_CIPHER_CTX_new();
        EVP_MD_CTX *mctx = EVP_MD_CTX_new();
        if (ctx == NULL || mctx == NULL) {
            EVP_CIPHER_CTX_free(ctx);
            EVP_MD_CTX_free(mctx);
            return PyErr_NoMemory();
        }
        for (rounds = 1;; rounds++) {
            Py_ssize_t unit = plen + klen + ulen;
            Py_ssize_t k1len = unit * 64;
            int outl = 0, tmpl = 0, mod;
            unsigned char block[256];
            Py_ssize_t off;
            /* k1 = (pwd + k + udata) * 64 — build one unit, tile it */
            memcpy(block, pwd, plen);
            memcpy(block + plen, k, klen);
            memcpy(block + plen + klen, udata, ulen);
            for (off = 0; off < k1len; off += unit)
                memcpy(k1 + off, block, unit);
            /* e = AES-128-CBC(key=k[0:16], iv=k[16:32], k1), no pad */
            if (!EVP_EncryptInit_ex(ctx, g_aes, NULL, k, k + 16) ||
                !EVP_CIPHER_CTX_set_padding(ctx, 0) ||
                !EVP_EncryptUpdate(ctx, e, &outl, k1, (int)k1len) ||
                !EVP_EncryptFinal_ex(ctx, e + outl, &tmpl)) {
                EVP_CIPHER_CTX_free(ctx);
                EVP_MD_CTX_free(mctx);
                PyErr_SetString(PyExc_RuntimeError, "EVP AES failed");
                return NULL;
            }
            outl += tmpl;
            /* next k = {sha256, sha384, sha512}[sum(e[:16]) % 3](e) */
            mod = 0;
            for (i = 0; i < 16; i++)
                mod += e[i];
            mod %= 3;
            {
                const EVP_MD *md = mod == 0   ? g_sha256
                                   : mod == 1 ? g_sha384
                                              : g_sha512;
                if (!EVP_DigestInit_ex(mctx, md, NULL) ||
                    !EVP_DigestUpdate(mctx, e, outl) ||
                    !EVP_DigestFinal_ex(mctx, k, &klen)) {
                    EVP_CIPHER_CTX_free(ctx);
                    EVP_MD_CTX_free(mctx);
                    PyErr_SetString(PyExc_RuntimeError, "EVP_Digest failed");
                    return NULL;
                }
            }
            if (rounds >= 64 && e[outl - 1] <= (unsigned)(rounds - 32))
                break;
        }
        EVP_CIPHER_CTX_free(ctx);
        EVP_MD_CTX_free(mctx);
    }
    return PyBytes_FromStringAndSize((const char *)k, 32);
}

/* RC4 (KSA + PRGA) in plain C — no OpenSSL involved: RC4 sits in
 * OpenSSL 3's legacy provider and the `cryptography` wrapper pays a
 * fresh context + provider dispatch per call, which dominates the
 * many small per-object encryptions a PDF performs.  Byte-identical
 * to crypt.rc4's pure-Python fallback (parity-tested). */
static PyObject *
chash_rc4(PyObject *self, PyObject *args)
{
    const unsigned char *key, *data;
    Py_ssize_t klen, n, i;
    unsigned char s[256];
    unsigned int a, j, b;
    PyObject *res;
    unsigned char *out;

    (void)self;
    if (!PyArg_ParseTuple(args, "y#y#", &key, &klen, &data, &n))
        return NULL;
    if (klen < 1 || klen > 256) {
        PyErr_SetString(PyExc_ValueError, "rc4 key length");
        return NULL;
    }
    res = PyBytes_FromStringAndSize(NULL, n);
    if (res == NULL)
        return NULL;
    out = (unsigned char *)PyBytes_AS_STRING(res);
    for (i = 0; i < 256; i++)
        s[i] = (unsigned char)i;
    j = 0;
    for (i = 0; i < 256; i++) {
        unsigned char t;
        j = (j + s[i] + key[i % klen]) & 255;
        t = s[i];
        s[i] = s[j];
        s[j] = t;
    }
    a = j = 0;
    for (i = 0; i < n; i++) {
        unsigned char t;
        a = (a + 1) & 255;
        j = (j + s[a]) & 255;
        t = s[a];
        s[a] = s[j];
        s[j] = t;
        b = (s[a] + s[j]) & 255;
        out[i] = data[i] ^ s[b];
    }
    return res;
}

/* AES-CBC with the module-init-fetched ciphers (128/256 by key len),
 * NO padding — the Python callers own the PKCS#5 logic.  One ctx per
 * call but zero provider fetches and zero abc/isinstance overhead. */
static PyObject *
chash_aes_cbc(PyObject *self, PyObject *args)
{
    const unsigned char *key, *iv, *data;
    Py_ssize_t klen, ivlen, n;
    int decrypt;
    const EVP_CIPHER *ciph;
    EVP_CIPHER_CTX *ctx;
    PyObject *res;
    int outl = 0, tmpl = 0, ok;

    (void)self;
    if (!PyArg_ParseTuple(args, "y#y#y#p", &key, &klen, &iv, &ivlen, &data,
                          &n, &decrypt))
        return NULL;
    if (ivlen != 16 || (klen != 16 && klen != 32) || (n % 16) != 0) {
        PyErr_SetString(PyExc_ValueError, "aes_cbc geometry");
        return NULL;
    }
    if (n > INT_MAX - 32) {
        /* EVP_*Update takes int lengths: a Py_ssize_t truncation
         * would silently process a prefix and return uninitialized
         * heap for the rest — refuse; the Python gate keeps such
         * inputs on the `cryptography` fallback */
        PyErr_SetString(PyExc_ValueError, "aes_cbc input too large");
        return NULL;
    }
    ciph = klen == 16 ? g_aes : g_aes256;
    /* +16: the documented EVP_*Update contract wants inl + block_size
     * of output headroom even when NO_PADDING makes the actual write
     * exactly inl today; resized back down after the length check */
    res = PyBytes_FromStringAndSize(NULL, n + 16);
    if (res == NULL)
        return NULL;
    ctx = EVP_CIPHER_CTX_new();
    if (ctx == NULL) {
        Py_DECREF(res);
        return PyErr_NoMemory();
    }
    if (decrypt)
        ok = EVP_DecryptInit_ex(ctx, ciph, NULL, key, iv) &&
             EVP_CIPHER_CTX_set_padding(ctx, 0) &&
             EVP_DecryptUpdate(ctx,
                               (unsigned char *)PyBytes_AS_STRING(res),
                               &outl, data, (int)n) &&
             EVP_DecryptFinal_ex(
                 ctx, (unsigned char *)PyBytes_AS_STRING(res) + outl,
                 &tmpl);
    else
        ok = EVP_EncryptInit_ex(ctx, ciph, NULL, key, iv) &&
             EVP_CIPHER_CTX_set_padding(ctx, 0) &&
             EVP_EncryptUpdate(ctx,
                               (unsigned char *)PyBytes_AS_STRING(res),
                               &outl, data, (int)n) &&
             EVP_EncryptFinal_ex(
                 ctx, (unsigned char *)PyBytes_AS_STRING(res) + outl,
                 &tmpl);
    EVP_CIPHER_CTX_free(ctx);
    if (!ok || (Py_ssize_t)outl + (Py_ssize_t)tmpl != n) {
        Py_DECREF(res);
        PyErr_SetString(PyExc_RuntimeError, "EVP AES-CBC failed");
        return NULL;
    }
    if (_PyBytes_Resize(&res, n) < 0) /* drop the +16 headroom */
        return NULL;
    return res;
}

static PyMethodDef chash_methods[] = {
    {"hash_2b", chash_hash_2b, METH_VARARGS,
     "hash_2b(pwd, salt, udata) -> 32-byte key (ISO 32000-2 Alg 2.B)"},
    {"rc4", chash_rc4, METH_VARARGS,
     "rc4(key, data) -> bytes (symmetric RC4, plain C)"},
    {"aes_cbc", chash_aes_cbc, METH_VARARGS,
     "aes_cbc(key, iv, data, decrypt) -> bytes (no padding)"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef chash_module = {
    PyModuleDef_HEAD_INIT, "_chash",
    "C fast path for the ISO 32000-2 Algorithm 2.B password hash", -1,
    chash_methods, NULL, NULL, NULL, NULL};

PyMODINIT_FUNC
PyInit__chash(void)
{
    g_aes = EVP_CIPHER_fetch(NULL, "AES-128-CBC", NULL);
    g_aes256 = EVP_CIPHER_fetch(NULL, "AES-256-CBC", NULL);
    g_sha256 = EVP_MD_fetch(NULL, "SHA2-256", NULL);
    g_sha384 = EVP_MD_fetch(NULL, "SHA2-384", NULL);
    g_sha512 = EVP_MD_fetch(NULL, "SHA2-512", NULL);
    if (!g_aes || !g_aes256 || !g_sha256 || !g_sha384 || !g_sha512) {
        PyErr_SetString(PyExc_ImportError, "OpenSSL EVP fetch failed");
        return NULL;
    }
    return PyModule_Create(&chash_module);
}
