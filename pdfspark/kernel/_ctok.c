/* _ctok — C fast path for the COS token scanner (cos.py parse_object).
 *
 * Semantic contract: byte-for-byte identical results to the pure-Python
 * scanner in pdfspark/kernel/cos.py (the authoritative implementation,
 * itself transcribed from the reference's parser/PDFParser.java:226-300
 * dispatch + cos/COSString.java / cos/COSName.java / cos/COSNumber.java
 * token rules). Differential parity is enforced by
 * tests/test_ctok_parity.py; any divergence is a bug in THIS file.
 *
 * The module is compiled on demand by pdfspark/kernel/ctok.py (gcc -O2,
 * cached .so keyed by source hash) and is strictly optional: import or
 * compile failure falls back to the pure-Python scanner, and
 * PDFSPARK_NO_CTOK=1 disables it outright. Python object construction
 * goes through the SAME class objects and interned-name cache that the
 * Python scanner uses (configured once via ctok_configure), so values
 * are indistinguishable downstream.
 */
#define _GNU_SOURCE /* memmem */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>
#include <stdlib.h>

/* class objects / singletons handed over by cos.py at import */
typedef struct {
    PyObject *CDict;
    PyObject *CString;
    PyObject *NameType;
    PyObject *Ref;
    PyObject *CStream;
    PyObject *cos_null;
    PyObject *name_cache;     /* cos._NAME_CACHE (shared interning) */
    PyObject *name_from_run;  /* cos._name_from_run (miss path)     */
    PyObject *eparse;         /* kernel.errors.EParseError          */
    PyObject *length_name;    /* Name("Length") for salvage rewrite */
    int configured;
} ctok_state_t;

static ctok_state_t S = {0};

static int
is_ws_c(unsigned char b)
{
    return b == 0x00 || b == 0x09 || b == 0x0A || b == 0x0C || b == 0x0D ||
           b == 0x20;
}

static int
is_delim_c(unsigned char b)
{
    return b == '(' || b == ')' || b == '<' || b == '>' || b == '[' ||
           b == ']' || b == '{' || b == '}' || b == '/' || b == '%';
}

static int
is_term_c(unsigned char b)
{
    return is_ws_c(b) || is_delim_c(b);
}

/* whitespace + %-comments between tokens (raw.skip_ws_and_comments) */
static void
skip_ws_comments(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos)
{
    Py_ssize_t p = *pos;
    for (;;) {
        while (p < n && is_ws_c(d[p]))
            p++;
        if (p < n && d[p] == '%') {
            while (p < n && d[p] != '\r' && d[p] != '\n')
                p++;
            continue;
        }
        break;
    }
    *pos = p;
}

static void
err_at(const char *what, Py_ssize_t pos)
{
    PyErr_Format(S.eparse, "%s at %zd", what, pos);
}

/* /Name token → interned Name (shared cache; Python helper on miss) */
static PyObject *
name_token(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos)
{
    Py_ssize_t p = *pos + 1, s;
    s = p;
    while (p < n && !is_term_c(d[p]))
        p++;
    {
        PyObject *run = PyBytes_FromStringAndSize((const char *)d + s, p - s);
        PyObject *nm;
        if (run == NULL)
            return NULL;
        nm = PyDict_GetItemWithError(S.name_cache, run); /* borrowed */
        if (nm != NULL) {
            Py_INCREF(nm);
            Py_DECREF(run);
            *pos = p;
            return nm;
        }
        if (PyErr_Occurred()) {
            Py_DECREF(run);
            return NULL;
        }
        nm = PyObject_CallFunctionObjArgs(S.name_from_run, run, NULL);
        Py_DECREF(run);
        if (nm == NULL)
            return NULL;
        *pos = p;
        return nm;
    }
}

/* number with the terminator rule (cos._TOK_RE number alternative /
 * TestCOSNumber.java:152-274 semantics) */
static PyObject *
number_token(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos)
{
    Py_ssize_t s = *pos, p = s;
    Py_ssize_t intd = 0, fracd = 0;
    int isfloat = 0;
    if (p < n && (d[p] == '+' || d[p] == '-'))
        p++;
    while (p < n && d[p] >= '0' && d[p] <= '9') {
        p++;
        intd++;
    }
    if (p < n && d[p] == '.' && intd > 0) {
        isfloat = 1;
        p++;
        while (p < n && d[p] >= '0' && d[p] <= '9') {
            p++;
            fracd++;
        }
    } else if (p < n && d[p] == '.' && intd == 0) {
        isfloat = 1;
        p++;
        while (p < n && d[p] >= '0' && d[p] <= '9') {
            p++;
            fracd++;
        }
        if (fracd == 0) {
            err_at("malformed number", s);
            return NULL;
        }
    }
    if (intd == 0 && fracd == 0) {
        err_at("malformed number", s);
        return NULL;
    }
    if (p < n && !is_term_c(d[p])) {
        err_at("malformed number (bad terminator)", s);
        return NULL;
    }
    *pos = p;
    if (!isfloat) {
        if (p - s <= 18) { /* fits a long long incl. sign */
            long long v = strtoll((const char *)d + s, NULL, 10);
            return PyLong_FromLongLong(v);
        } else {
            char buf[64];
            char *heap = NULL;
            const char *src = (const char *)d + s;
            Py_ssize_t len = p - s;
            PyObject *out;
            char *dst = buf;
            if (len >= (Py_ssize_t)sizeof(buf)) {
                heap = (char *)PyMem_Malloc(len + 1);
                if (heap == NULL)
                    return PyErr_NoMemory();
                dst = heap;
            }
            memcpy(dst, src, len);
            dst[len] = 0;
            out = PyLong_FromString(dst, NULL, 10);
            if (heap)
                PyMem_Free(heap);
            return out;
        }
    } else {
        char buf[64];
        char *heap = NULL;
        Py_ssize_t len = p - s;
        char *dst = buf;
        double val;
        if (len >= (Py_ssize_t)sizeof(buf)) {
            heap = (char *)PyMem_Malloc(len + 1);
            if (heap == NULL)
                return PyErr_NoMemory();
            dst = heap;
        }
        memcpy(dst, (const char *)d + s, len);
        dst[len] = 0;
        val = PyOS_string_to_double(dst, NULL, S.eparse);
        if (heap)
            PyMem_Free(heap);
        if (val == -1.0 && PyErr_Occurred())
            return NULL;
        return PyFloat_FromDouble(val);
    }
}

/* digit-led dispatch: speculative `id gen R` (T9 fast path, mirrors
 * cos._TOK_RE ref alternative: id 1-9 digits, gen 1-5 digits, ws+
 * separators, terminator after R), else plain number */
static PyObject *
num_or_ref_token(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos)
{
    Py_ssize_t p = *pos;
    Py_ssize_t i = p, idlen, j, g, glen, k;
    while (i < n && d[i] >= '0' && d[i] <= '9')
        i++;
    idlen = i - p;
    if (idlen >= 1 && idlen <= 9 && i < n && is_ws_c(d[i])) {
        j = i;
        while (j < n && is_ws_c(d[j]))
            j++;
        g = j;
        while (j < n && d[j] >= '0' && d[j] <= '9')
            j++;
        glen = j - g;
        if (glen >= 1 && glen <= 5 && j < n && is_ws_c(d[j])) {
            k = j;
            while (k < n && is_ws_c(d[k]))
                k++;
            if (k < n && d[k] == 'R' &&
                (k + 1 >= n || is_term_c(d[k + 1]))) {
                long idv = strtol((const char *)d + p, NULL, 10);
                long genv = strtol((const char *)d + g, NULL, 10);
                *pos = k + 1;
                return PyObject_CallFunction(S.Ref, "ll", idv, genv);
            }
        }
    }
    return number_token(d, n, pos);
}

/* (literal string) — port of cos.parse_literal_string (T4;
 * cos/COSString.java:164-296 semantics pinned by test_cos_tokens) */
static PyObject *
literal_string_token(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos)
{
    Py_ssize_t p = *pos + 1;
    Py_ssize_t cap = 64, len = 0;
    int depth = 1;
    unsigned char *out = (unsigned char *)PyMem_Malloc(cap);
    PyObject *raw, *res;
    if (out == NULL)
        return PyErr_NoMemory();
#define PUTC(c)                                                           \
    do {                                                                  \
        if (len >= cap) {                                                 \
            unsigned char *nb;                                            \
            cap *= 2;                                                     \
            nb = (unsigned char *)PyMem_Realloc(out, cap);                \
            if (nb == NULL) {                                             \
                PyMem_Free(out);                                          \
                return PyErr_NoMemory();                                  \
            }                                                             \
            out = nb;                                                     \
        }                                                                 \
        out[len++] = (unsigned char)(c);                                  \
    } while (0)
#define PUTS(src, cnt)                                                    \
    do {                                                                  \
        Py_ssize_t need = len + (cnt);                                    \
        if (need > cap) {                                                 \
            unsigned char *nb;                                            \
            while (cap < need)                                            \
                cap *= 2;                                                 \
            nb = (unsigned char *)PyMem_Realloc(out, cap);                \
            if (nb == NULL) {                                             \
                PyMem_Free(out);                                          \
                return PyErr_NoMemory();                                  \
            }                                                             \
            out = nb;                                                     \
        }                                                                 \
        memcpy(out + len, (src), (cnt));                                  \
        len += (cnt);                                                     \
    } while (0)
    while (p < n) {
        /* bulk-copy the run up to the next special byte (\ ( ) CR) */
        Py_ssize_t runstart = p;
        while (p < n && d[p] != 0x5C && d[p] != 0x28 && d[p] != 0x29 &&
               d[p] != 0x0D)
            p++;
        if (p > runstart)
            PUTS(d + runstart, p - runstart);
        if (p >= n)
            break;
        {
            unsigned char b = d[p];
            if (b == 0x5C) { /* backslash */
                unsigned char e;
                p++;
                if (p >= n)
                    break;
                e = d[p];
                switch (e) {
                case 'n': PUTC(0x0A); p++; break;
                case 'r': PUTC(0x0D); p++; break;
                case 't': PUTC(0x09); p++; break;
                case 'b': PUTC(0x08); p++; break;
                case 'f': PUTC(0x0C); p++; break;
                case '(': PUTC(0x28); p++; break;
                case ')': PUTC(0x29); p++; break;
                case 0x5C: PUTC(0x5C); p++; break;
                default:
                    if (e >= '0' && e <= '7') { /* octal, 1-3 digits */
                        int val = e - '0', it;
                        p++;
                        for (it = 0; it < 2; it++) {
                            if (p < n && d[p] >= '0' && d[p] <= '7') {
                                val = (val << 3) | (d[p] - '0');
                                p++;
                            } else
                                break;
                        }
                        PUTC(val & 0xFF);
                    } else if (e == 0x0D) { /* \<CR>[LF] continuation */
                        p++;
                        if (p < n && d[p] == 0x0A)
                            p++;
                    } else if (e == 0x0A) { /* \<LF> continuation */
                        p++;
                    } else { /* unknown escape: drop backslash */
                        PUTC(e);
                        p++;
                    }
                }
            } else if (b == 0x28) {
                depth++;
                PUTC(b);
                p++;
            } else if (b == 0x29) {
                depth--;
                if (depth == 0) {
                    p++;
                    *pos = p;
                    raw = PyBytes_FromStringAndSize((const char *)out, len);
                    PyMem_Free(out);
                    if (raw == NULL)
                        return NULL;
                    res = PyObject_CallFunctionObjArgs(S.CString, raw, NULL);
                    Py_DECREF(raw);
                    return res;
                }
                PUTC(b);
                p++;
            } else { /* bare CR → LF */
                PUTC(0x0A);
                p++;
                if (p < n && d[p] == 0x0A)
                    p++;
            }
        }
    }
    PyMem_Free(out);
    PyErr_SetString(S.eparse, "unterminated literal string");
    return NULL;
#undef PUTC
#undef PUTS
}

static int
hexval(unsigned char b)
{
    if (b >= '0' && b <= '9')
        return b - '0';
    if (b >= 'a' && b <= 'f')
        return b - 'a' + 10;
    if (b >= 'A' && b <= 'F')
        return b - 'A' + 10;
    return -1;
}

/* <hex string> — port of cos.parse_hex_string (T5) */
static PyObject *
hex_string_token(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos)
{
    Py_ssize_t p = *pos + 1;
    Py_ssize_t cap = 32, len = 0;
    int hi = -1;
    unsigned char *out = (unsigned char *)PyMem_Malloc(cap);
    if (out == NULL)
        return PyErr_NoMemory();
    while (p < n) {
        unsigned char b = d[p];
        if (b == '>') {
            PyObject *raw, *res;
            p++;
            if (hi >= 0) {
                if (len >= cap) {
                    unsigned char *nb =
                        (unsigned char *)PyMem_Realloc(out, cap * 2);
                    if (nb == NULL) {
                        PyMem_Free(out);
                        return PyErr_NoMemory();
                    }
                    out = nb;
                }
                out[len++] = (unsigned char)(hi << 4);
            }
            *pos = p;
            raw = PyBytes_FromStringAndSize((const char *)out, len);
            PyMem_Free(out);
            if (raw == NULL)
                return NULL;
            res = PyObject_CallFunctionObjArgs(S.CString, raw, Py_True, NULL);
            Py_DECREF(raw);
            return res;
        }
        if (is_ws_c(b)) {
            p++;
            continue;
        }
        {
            int v = hexval(b);
            if (v < 0) {
                PyMem_Free(out);
                PyErr_Format(S.eparse, "invalid hex digit 0x%x at %zd",
                             (int)b, p);
                return NULL;
            }
            if (hi < 0)
                hi = v;
            else {
                if (len >= cap) {
                    unsigned char *nb =
                        (unsigned char *)PyMem_Realloc(out, cap * 2);
                    if (nb == NULL) {
                        PyMem_Free(out);
                        return PyErr_NoMemory();
                    }
                    out = nb;
                    cap *= 2;
                }
                out[len++] = (unsigned char)((hi << 4) | v);
                hi = -1;
            }
        }
        p++;
    }
    PyMem_Free(out);
    PyErr_SetString(S.eparse, "unterminated hex string");
    return NULL;
}

/* T8 stream follow-up after '>>' — port of cos._stream_followup.
 * Returns a NEW reference: the CStream, or the dict itself (incref'd)
 * when no stream keyword follows. NULL on error. */
static PyObject *
stream_followup(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos,
                PyObject *dict, PyObject *resolver, PyObject *settings,
                int allow_recon, long max_scan)
{
    Py_ssize_t save = *pos, p = *pos;
    PyObject *length, *body = NULL, *res;
    while (p < n && is_ws_c(d[p])) /* plain ws only, no comments */
        p++;
    if (!(p + 6 <= n && memcmp(d + p, "stream", 6) == 0)) {
        *pos = save;
        Py_INCREF(dict);
        return dict;
    }
    p += 6;
    /* skip_crlf_or_lf (B3): lone CR is a syntax-compliance event */
    if (p < n && d[p] == 0x0D) {
        p++;
        if (p < n && d[p] == 0x0A)
            p++;
        else if (settings != Py_None) { /* None ⇒ ignore-tier (lexer) */
            PyObject *r = PyObject_CallMethod(
                settings, "soft_syntax", "(Os)", Py_False,
                "lone CR after 'stream' keyword");
            if (r == NULL)
                return NULL;
            Py_DECREF(r);
        }
    } else if (p < n && d[p] == 0x0A)
        p++;

    length = PyDict_GetItemString(dict, "Length"); /* borrowed */
    if (length == NULL)
        length = S.cos_null;
    {
        int isref = PyObject_IsInstance(length, S.Ref);
        if (isref < 0)
            return NULL;
        if (isref) {
        if (resolver == Py_None) {
            PyErr_SetString(S.eparse,
                            "/Length is indirect but no resolver available");
            return NULL;
        }
        length = PyObject_CallFunctionObjArgs(resolver, length, NULL);
        if (length == NULL)
            return NULL;
        } else
            Py_INCREF(length);
    }

    if (!PyLong_CheckExact(length)) { /* bool is PyLong subclass → excluded */
        Py_DECREF(length);
        if (allow_recon) {
            /* §C.2 salvage: everything up to `endstream`, minus EOL */
            const unsigned char *hit = (const unsigned char *)memmem(
                d + p, n - p, "endstream", 9);
            Py_ssize_t end, blen;
            if (hit == NULL) {
                PyErr_SetString(S.eparse,
                                "stream /Length missing and no endstream");
                return NULL;
            }
            end = hit - d;
            blen = end - p;
            if (blen >= 2 && d[end - 2] == 0x0D && d[end - 1] == 0x0A)
                blen -= 2;
            else if (blen >= 1 && (d[end - 1] == 0x0A || d[end - 1] == 0x0D))
                blen -= 1;
            *pos = end + 9;
            body = PyBytes_FromStringAndSize((const char *)d + p, blen);
            if (body == NULL)
                return NULL;
            {
                PyObject *blen_obj = PyLong_FromSsize_t(blen);
                if (blen_obj == NULL ||
                    PyDict_SetItem(dict, S.length_name, blen_obj) < 0) {
                    Py_XDECREF(blen_obj);
                    Py_DECREF(body);
                    return NULL;
                }
                Py_DECREF(blen_obj);
            }
            res = PyObject_CallFunctionObjArgs(S.CStream, dict, body, NULL);
            Py_DECREF(body);
            return res;
        }
        PyErr_SetString(S.eparse, "stream /Length missing or non-integer");
        return NULL;
    }
    {
        long long lv = PyLong_AsLongLong(length);
        Py_DECREF(length);
        if (lv == -1 && PyErr_Occurred())
            return NULL;
        if (lv < 0 || p + lv > n) {
            PyErr_SetString(S.eparse, "stream body beyond end of data");
            return NULL;
        }
        body = PyBytes_FromStringAndSize((const char *)d + p, (Py_ssize_t)lv);
        if (body == NULL)
            return NULL;
        p += (Py_ssize_t)lv;
        /* bounded forward scan for endstream (B9) */
        {
            Py_ssize_t lim = p + max_scan + 9;
            Py_ssize_t avail;
            const unsigned char *hit;
            if (lim > n)
                lim = n;
            avail = lim - p;
            hit = avail > 0 ? (const unsigned char *)memmem(d + p, avail,
                                                            "endstream", 9)
                            : NULL;
            if (hit == NULL) {
                if (settings != Py_None) { /* None ⇒ ignore-tier */
                    PyObject *r = PyObject_CallMethod(
                        settings, "soft_structure", "(Os)", Py_False,
                        "endstream not found within scan range");
                    if (r == NULL) {
                        Py_DECREF(body);
                        return NULL;
                    }
                    Py_DECREF(r);
                }
            } else
                p = (hit - d) + 9;
        }
        *pos = p;
        res = PyObject_CallFunctionObjArgs(S.CStream, dict, body, NULL);
        Py_DECREF(body);
        return res;
    }
}

/* container stack */
typedef struct {
    PyObject *cont; /* borrowed while on stack? NO — owned */
    PyObject *key;  /* owned or NULL */
} frame_t;

/* main scanner: one COS value from pos; mirrors cos.parse_object */
static PyObject *
parse_value(const unsigned char *d, Py_ssize_t n, Py_ssize_t *pos_io,
            PyObject *resolver, PyObject *settings, int allow_recon,
            long max_scan)
{
    Py_ssize_t pos = *pos_io;
    frame_t *stack = NULL;
    Py_ssize_t depth = 0, cap = 0;
    PyObject *cur = NULL; /* owned */
    PyObject *key = NULL; /* owned */
    int want_key = 0;
    PyObject *v = NULL;

#define FAIL()                                                            \
    do {                                                                  \
        goto fail;                                                        \
    } while (0)

    for (;;) {
        unsigned char b;
        skip_ws_comments(d, n, &pos);
        if (pos >= n) {
            if (want_key || (cur != NULL && PyDict_Check(cur)))
                PyErr_SetString(S.eparse, "EOF inside dictionary");
            else if (cur != NULL)
                PyErr_SetString(S.eparse, "EOF inside array");
            else
                PyErr_SetString(S.eparse, "unexpected EOF at value position");
            FAIL();
        }
        b = d[pos];
        if (want_key) {
            if (b == '/') {
                key = name_token(d, n, &pos);
                if (key == NULL)
                    FAIL();
                want_key = 0;
                continue;
            }
            if (b == '>' && pos + 1 < n && d[pos + 1] == '>') {
                pos += 2;
                v = stream_followup(d, n, &pos, cur, resolver, settings,
                                    allow_recon, max_scan);
                if (v == NULL)
                    FAIL();
                Py_DECREF(cur); /* ownership moved into v (or v==cur+1ref) */
                cur = NULL;
                if (depth == 0)
                    goto done;
                depth--;
                cur = stack[depth].cont;
                key = stack[depth].key;
                goto attach;
            }
            err_at("name expected", pos);
            FAIL();
        }
        /* value position */
        if (b >= '0' && b <= '9') {
            v = num_or_ref_token(d, n, &pos);
            if (v == NULL)
                FAIL();
        } else if (b == '/') {
            v = name_token(d, n, &pos);
            if (v == NULL)
                FAIL();
        } else if (b == '<') {
            if (pos + 1 < n && d[pos + 1] == '<') {
                /* push dict */
                if (depth == cap) {
                    Py_ssize_t ncap = cap ? cap * 2 : 16;
                    frame_t *ns = (frame_t *)PyMem_Realloc(
                        stack, ncap * sizeof(frame_t));
                    if (ns == NULL) {
                        PyErr_NoMemory();
                        FAIL();
                    }
                    stack = ns;
                    cap = ncap;
                }
                stack[depth].cont = cur;
                stack[depth].key = key;
                depth++;
                cur = PyObject_CallObject(S.CDict, NULL);
                key = NULL;
                if (cur == NULL) {
                    depth--; /* restore frame ownership */
                    cur = stack[depth].cont;
                    key = stack[depth].key;
                    FAIL();
                }
                want_key = 1;
                pos += 2;
                continue;
            }
            v = hex_string_token(d, n, &pos);
            if (v == NULL)
                FAIL();
        } else if (b == '[') {
            if (depth == cap) {
                Py_ssize_t ncap = cap ? cap * 2 : 16;
                frame_t *ns =
                    (frame_t *)PyMem_Realloc(stack, ncap * sizeof(frame_t));
                if (ns == NULL) {
                    PyErr_NoMemory();
                    FAIL();
                }
                stack = ns;
                cap = ncap;
            }
            stack[depth].cont = cur;
            stack[depth].key = key;
            depth++;
            cur = PyList_New(0);
            key = NULL;
            if (cur == NULL) {
                depth--;
                cur = stack[depth].cont;
                key = stack[depth].key;
                FAIL();
            }
            pos += 1;
            continue;
        } else if (b == ']') {
            if (cur == NULL || !PyList_Check(cur)) {
                err_at("unknown token b']'", pos);
                FAIL();
            }
            pos += 1;
            v = cur;
            if (depth == 0) {
                cur = NULL;
                goto done;
            }
            depth--;
            cur = stack[depth].cont;
            key = stack[depth].key;
        } else if (b == '(') {
            v = literal_string_token(d, n, &pos);
            if (v == NULL)
                FAIL();
        } else if (b == 't') {
            if (pos + 4 <= n && memcmp(d + pos, "true", 4) == 0) {
                pos += 4;
                v = Py_True;
                Py_INCREF(v);
            } else {
                err_at("bad token", pos);
                FAIL();
            }
        } else if (b == 'f') {
            if (pos + 5 <= n && memcmp(d + pos, "false", 5) == 0) {
                pos += 5;
                v = Py_False;
                Py_INCREF(v);
            } else {
                err_at("bad token", pos);
                FAIL();
            }
        } else if (b == 'n') {
            if (pos + 4 <= n && memcmp(d + pos, "null", 4) == 0) {
                pos += 4;
                v = S.cos_null;
                Py_INCREF(v);
            } else {
                err_at("bad token", pos);
                FAIL();
            }
        } else if (b == '+' || b == '-' || b == '.') {
            v = number_token(d, n, &pos);
            if (v == NULL)
                FAIL();
        } else {
            PyErr_Format(S.eparse, "unknown token %c at %zd",
                         (b >= 0x20 && b < 0x7F) ? b : '?', pos);
            FAIL();
        }

    attach:
        /* one value completed — attach to parent or return */
        if (cur == NULL)
            goto done;
        if (PyDict_Check(cur)) {
            int rc = PyDict_SetItem(cur, key, v);
            Py_DECREF(key);
            key = NULL;
            Py_DECREF(v);
            v = NULL;
            if (rc < 0)
                FAIL();
            want_key = 1;
        } else {
            int rc = PyList_Append(cur, v);
            Py_DECREF(v);
            v = NULL;
            if (rc < 0)
                FAIL();
            want_key = 0;
        }
    }

done:
    if (stack)
        PyMem_Free(stack);
    *pos_io = pos;
    return v;

fail:
    Py_XDECREF(v);
    Py_XDECREF(key);
    Py_XDECREF(cur);
    while (depth > 0) {
        depth--;
        Py_XDECREF(stack[depth].cont);
        Py_XDECREF(stack[depth].key);
    }
    if (stack)
        PyMem_Free(stack);
    return NULL;
}

/* ---- content-stream lexer (textops._lex_content_py twin) ----------
 * Yields the SAME (operator_bytes, operands_tuple) event stream the
 * pure-Python generator produces (differential parity in
 * tests/test_ctok_parity.py): PERMISSIVE stray handling, inline TJ
 * arrays, '('/'<' through the generic value parser, BI..EI skipped at
 * the lexer. Soft parse events (lone CR, endstream scan) are treated
 * as ignored — identical observable behavior to the Python path's
 * DEFAULT_SETTINGS (ignore tiers log-only). Returns a list, eagerly
 * lexed: an EParseError mid-stream aborts the document either way. */

static int
is_regular_c(unsigned char b)
{
    return !is_ws_c(b) && !is_delim_c(b);
}

static PyObject *
ctok_lex_content(PyObject *self, PyObject *args)
{
    PyObject *data;
    const unsigned char *d;
    Py_ssize_t n, pos = 0;
    PyObject *out = NULL, *operands = NULL;
    PyObject **astack = NULL;
    Py_ssize_t adep = 0, acap = 0;

    (void)self;
    if (!S.configured) {
        PyErr_SetString(PyExc_RuntimeError, "_ctok not configured");
        return NULL;
    }
    if (!PyArg_ParseTuple(args, "S", &data))
        return NULL;
    d = (const unsigned char *)PyBytes_AS_STRING(data);
    n = PyBytes_GET_SIZE(data);
    out = PyList_New(0);
    operands = PyList_New(0);
    if (out == NULL || operands == NULL)
        goto fail;

#define CLEAR_OPERANDS()                                                  \
    do {                                                                  \
        if (PyList_GET_SIZE(operands)) {                                  \
            PyObject *no = PyList_New(0);                                 \
            if (no == NULL)                                               \
                goto fail;                                                \
            Py_DECREF(operands);                                          \
            operands = no;                                                \
        }                                                                 \
    } while (0)

    while (pos < n) {
        unsigned char b;
        skip_ws_comments(d, n, &pos);
        if (pos >= n)
            break;
        b = d[pos];
        if ((b >= '0' && b <= '9') || b == '+' || b == '-' || b == '.') {
            /* number with the content terminator rule (regular byte
             * after the token → the whole token is a stray byte) */
            Py_ssize_t s = pos, p = pos;
            Py_ssize_t intd = 0, fracd = 0;
            int bad = 0;
            if (d[p] == '+' || d[p] == '-')
                p++;
            while (p < n && d[p] >= '0' && d[p] <= '9') {
                p++;
                intd++;
            }
            if (p < n && d[p] == '.') {
                p++;
                while (p < n && d[p] >= '0' && d[p] <= '9') {
                    p++;
                    fracd++;
                }
            }
            if (intd == 0 && fracd == 0)
                bad = 1;
            else if (p < n && is_regular_c(d[p]))
                bad = 1;
            if (bad) { /* stray: consume ONE byte, clear operands */
                pos = s + 1;
                CLEAR_OPERANDS();
                continue;
            }
            {
                PyObject *v;
                int isfloat = 0;
                Py_ssize_t q;
                for (q = s; q < p; q++)
                    if (d[q] == '.') {
                        isfloat = 1;
                        break;
                    }
                if (!isfloat && p - s <= 18) {
                    v = PyLong_FromLongLong(
                        strtoll((const char *)d + s, NULL, 10));
                } else {
                    char buf[64];
                    char *heap = NULL, *dst = buf;
                    Py_ssize_t len = p - s;
                    if (len >= (Py_ssize_t)sizeof(buf)) {
                        heap = (char *)PyMem_Malloc(len + 1);
                        if (heap == NULL) {
                            PyErr_NoMemory();
                            goto fail;
                        }
                        dst = heap;
                    }
                    memcpy(dst, d + s, len);
                    dst[len] = 0;
                    if (isfloat) {
                        double dv =
                            PyOS_string_to_double(dst, NULL, S.eparse);
                        v = (dv == -1.0 && PyErr_Occurred())
                                ? NULL
                                : PyFloat_FromDouble(dv);
                    } else
                        v = PyLong_FromString(dst, NULL, 10);
                    if (heap)
                        PyMem_Free(heap);
                }
                if (v == NULL)
                    goto fail;
                if (PyList_Append(operands, v) < 0) {
                    Py_DECREF(v);
                    goto fail;
                }
                Py_DECREF(v);
                pos = p;
            }
        } else if (b == '/') {
            PyObject *nm = name_token(d, n, &pos);
            if (nm == NULL)
                goto fail;
            if (PyList_Append(operands, nm) < 0) {
                Py_DECREF(nm);
                goto fail;
            }
            Py_DECREF(nm);
        } else if (b == '[') {
            if (adep == acap) {
                Py_ssize_t ncap = acap ? acap * 2 : 8;
                PyObject **ns = (PyObject **)PyMem_Realloc(
                    astack, ncap * sizeof(PyObject *));
                if (ns == NULL) {
                    PyErr_NoMemory();
                    goto fail;
                }
                astack = ns;
                acap = ncap;
            }
            astack[adep++] = operands;
            operands = PyList_New(0);
            if (operands == NULL) {
                operands = astack[--adep]; /* restore ownership */
                goto fail;
            }
            pos++;
        } else if (b == ']') {
            if (adep > 0) {
                PyObject *finished = operands;
                operands = astack[--adep];
                if (PyList_Append(operands, finished) < 0) {
                    Py_DECREF(finished);
                    goto fail;
                }
                Py_DECREF(finished);
            } else
                CLEAR_OPERANDS(); /* stray */
            pos++;
        } else if (b == '(' || b == '<') {
            PyObject *v = (b == '(')
                              ? literal_string_token(d, n, &pos)
                              : ((pos + 1 < n && d[pos + 1] == '<')
                                     ? parse_value(d, n, &pos, Py_None,
                                                   Py_None, 0, 100)
                                     : hex_string_token(d, n, &pos));
            if (v == NULL)
                goto fail;
            if (PyList_Append(operands, v) < 0) {
                Py_DECREF(v);
                goto fail;
            }
            Py_DECREF(v);
        } else if (is_regular_c(b)) {
            /* operator keyword run */
            Py_ssize_t s = pos;
            PyObject *opb, *tup, *ev;
            while (pos < n && is_regular_c(d[pos]))
                pos++;
            opb = PyBytes_FromStringAndSize((const char *)d + s, pos - s);
            if (opb == NULL)
                goto fail;
            if (pos - s == 2 && d[s] == 'B' && d[s + 1] == 'I') {
                /* inline image: skip to EI at lex level */
                const unsigned char *hit = (pos < n)
                    ? (const unsigned char *)memmem(d + pos, n - pos,
                                                    "EI", 2)
                    : NULL;
                pos = hit == NULL ? n : (hit - d) + 2;
            }
            tup = PyList_AsTuple(operands);
            if (tup == NULL) {
                Py_DECREF(opb);
                goto fail;
            }
            ev = PyTuple_Pack(2, opb, tup);
            Py_DECREF(opb);
            Py_DECREF(tup);
            if (ev == NULL)
                goto fail;
            if (PyList_Append(out, ev) < 0) {
                Py_DECREF(ev);
                goto fail;
            }
            Py_DECREF(ev);
            CLEAR_OPERANDS();
        } else {
            /* stray ) > { } or junk byte: consume one, clear */
            pos++;
            CLEAR_OPERANDS();
        }
    }
#undef CLEAR_OPERANDS
    Py_DECREF(operands);
    while (adep > 0)
        Py_DECREF(astack[--adep]);
    if (astack)
        PyMem_Free(astack);
    return out;

fail:
    Py_XDECREF(out);
    Py_XDECREF(operands);
    while (adep > 0)
        Py_DECREF(astack[--adep]);
    if (astack)
        PyMem_Free(astack);
    return NULL;
}

static PyObject *
ctok_parse_object(PyObject *self, PyObject *args)
{
    PyObject *data, *resolver, *settings;
    Py_ssize_t pos;
    int allow_recon;
    long max_scan;
    const unsigned char *d;
    Py_ssize_t n;
    PyObject *v;

    (void)self;
    if (!S.configured) {
        PyErr_SetString(PyExc_RuntimeError, "_ctok not configured");
        return NULL;
    }
    if (!PyArg_ParseTuple(args, "SnOOpl", &data, &pos, &resolver, &settings,
                          &allow_recon, &max_scan))
        return NULL;
    d = (const unsigned char *)PyBytes_AS_STRING(data);
    n = PyBytes_GET_SIZE(data);
    if (pos < 0 || pos > n) {
        PyErr_SetString(S.eparse, "unexpected EOF at value position");
        return NULL;
    }
    v = parse_value(d, n, &pos, resolver, settings, allow_recon, max_scan);
    if (v == NULL)
        return NULL;
    return Py_BuildValue("(Nn)", v, pos);
}

static PyObject *
ctok_configure(PyObject *self, PyObject *args)
{
    PyObject *cdict, *cstring, *name, *ref, *cstream, *cos_null;
    PyObject *name_cache, *name_from_run, *eparse;
    (void)self;
    if (!PyArg_ParseTuple(args, "OOOOOOOOO", &cdict, &cstring, &name, &ref,
                          &cstream, &cos_null, &name_cache, &name_from_run,
                          &eparse))
        return NULL;
    Py_XDECREF(S.CDict);
    Py_XDECREF(S.CString);
    Py_XDECREF(S.NameType);
    Py_XDECREF(S.Ref);
    Py_XDECREF(S.CStream);
    Py_XDECREF(S.cos_null);
    Py_XDECREF(S.name_cache);
    Py_XDECREF(S.name_from_run);
    Py_XDECREF(S.eparse);
    Py_XDECREF(S.length_name);
    Py_INCREF(cdict);
    Py_INCREF(cstring);
    Py_INCREF(name);
    Py_INCREF(ref);
    Py_INCREF(cstream);
    Py_INCREF(cos_null);
    Py_INCREF(name_cache);
    Py_INCREF(name_from_run);
    Py_INCREF(eparse);
    S.CDict = cdict;
    S.CString = cstring;
    S.NameType = name;
    S.Ref = ref;
    S.CStream = cstream;
    S.cos_null = cos_null;
    S.name_cache = name_cache;
    S.name_from_run = name_from_run;
    S.eparse = eparse;
    S.length_name = PyObject_CallFunction(name, "s", "Length");
    if (S.length_name == NULL)
        return NULL;
    S.configured = 1;
    Py_RETURN_NONE;
}

static PyMethodDef ctok_methods[] = {
    {"configure", ctok_configure, METH_VARARGS,
     "configure(CDict, CString, Name, Ref, CStream, COS_NULL, name_cache, "
     "name_from_run, EParseError)"},
    {"parse_object", ctok_parse_object, METH_VARARGS,
     "parse_object(data, pos, resolver, settings, allow_reconstruction, "
     "max_scan_range) -> (value, new_pos)"},
    {"lex_content", ctok_lex_content, METH_VARARGS,
     "lex_content(data) -> [(op_bytes, operands_tuple), ...]"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef ctok_module = {
    PyModuleDef_HEAD_INIT, "_ctok",
    "C fast path for the pdfspark COS token scanner", -1, ctok_methods,
    NULL, NULL, NULL, NULL};

PyMODINIT_FUNC
PyInit__ctok(void)
{
    return PyModule_Create(&ctok_module);
}
