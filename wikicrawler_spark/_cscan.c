/* Streaming-tokenizer scan loop in C (round-3 spike, VERDICT r2 ask #9).
 *
 * Mirrors html_tokenizer.StreamParser.feed's tokenization EXACTLY,
 * including the malformed-input edge semantics pinned by the goldens:
 *   - '<foo ...' unterminated: '<' dropped, rest is text
 *   - '<>'      : '>' and the rest are text
 *   - '<!...>'  : comment/doctype dropped, trailing text kept
 *   - non-alpha / non-alnum tag names: tag dropped, trailing text kept
 *
 * Input: UTF-8 bytes of one fragment. Output: int32 event quints
 * [type, a0, a1, b0, b1] into a caller-provided buffer:
 *   type 0 = text        a0:a1 = text bounds
 *   type 1 = open tag    a0:a1 = tag bounds, b0:b1 = raw attr bounds
 *   type 2 = close tag   a0:a1 = tag bounds
 *   type 3 = self-closing open tag (bounds as type 1)
 * The input buffer is READ-ONLY (Python passes the original bytes);
 * tag lowercasing happens on the Python-side slices.
 * Returns the number of events written; caller sizes the buffer at
 * 5 * (n/2 + 2) int32s which the event grammar cannot exceed.
 */
#include <stdint.h>

/* python str.strip() whitespace for ASCII: space, \t-\r (0x09-0x0d),
   and the file/group/record/unit separators 0x1c-0x1f (review r3) */
static int is_ws(unsigned char c) {
    return c == ' ' || (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f);
}
static int is_alpha(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
static int is_alnum(unsigned char c) {
    return is_alpha(c) || (c >= '0' && c <= '9');
}

int32_t scan(const unsigned char *s, int32_t n, int32_t *ev) {
    int32_t ne = 0;
    int32_t i = 0;
    /* leading text before the first '<' */
    int32_t start = 0;
    while (i < n && s[i] != '<') i++;
    if (i > start) { ev[ne*5] = 0; ev[ne*5+1] = start; ev[ne*5+2] = i; ne++; }
    while (i < n) {
        /* s[i] == '<' */
        int32_t piece = i + 1;                 /* after '<' */
        /* python tokenizes via fragment.split('<') + part.find('>'):
           the '>' search is bounded by the NEXT '<' */
        int32_t gt = piece;
        while (gt < n && s[gt] != '>' && s[gt] != '<') gt++;
        if (gt >= n || s[gt] == '<') {          /* no '>' in this part:
                                                   '<' dropped, part is text */
            if (gt > piece) { ev[ne*5]=0; ev[ne*5+1]=piece; ev[ne*5+2]=gt; ne++; }
            i = gt;
            continue;
        }
        if (gt == piece) {                      /* '<>' : '>' + rest text */
            int32_t t0 = gt;                    /* include the '>' */
            int32_t t1 = t0 + 1;
            while (t1 < n && s[t1] != '<') t1++;
            ev[ne*5]=0; ev[ne*5+1]=t0; ev[ne*5+2]=t1; ne++;
            i = t1;
            continue;
        }
        int32_t inner0 = piece, inner1 = gt;    /* tag innards bounds */
        int32_t text0 = gt + 1;
        unsigned char c0 = s[inner0];
        if (c0 == '!') {
            /* comment: drop */
        } else if (c0 == '/') {
            /* close tag: strip + lower + isalnum */
            int32_t a = inner0 + 1, b = inner1;
            while (a < b && is_ws(s[a])) a++;
            while (b > a && is_ws(s[b-1])) b--;
            int ok = (b > a);
            for (int32_t k = a; k < b; k++) {
                if (!is_alnum(s[k])) { ok = 0; break; }
            }
            if (ok) {
                ev[ne*5]=2; ev[ne*5+1]=a; ev[ne*5+2]=b; ne++;
            }
        } else {
            int32_t e = inner1;
            int selfclose = (s[e-1] == '/');
            if (selfclose) e--;
            /* find first ' ' (python uses find(" ") — space only) */
            int32_t sp = inner0;
            while (sp < e && s[sp] != ' ') sp++;
            int32_t t_end = sp;                 /* tag = inner[:sp] */
            int32_t a0, a1;
            if (sp < e) { a0 = sp + 1; a1 = e; } else { a0 = a1 = e; }
            /* python: tag.strip() when no space... careful: feed does
               inner.strip() only in the sp==-1 branch. Replicate: */
            int32_t t0 = inner0;
            if (sp >= e) {  /* no space: strip whole inner */
                while (t0 < t_end && is_ws(s[t0])) t0++;
                while (t_end > t0 && is_ws(s[t_end-1])) t_end--;
            }
            int ok = (t_end > t0) && is_alpha(s[t0]);
            if (ok) {
                for (int32_t k = t0; k < t_end; k++) {
                    if (!is_alnum(s[k])) { ok = 0; break; }
                }
            }
            if (ok) {
                ev[ne*5] = selfclose ? 3 : 1;
                ev[ne*5+1]=t0; ev[ne*5+2]=t_end;
                ev[ne*5+3]=a0; ev[ne*5+4]=a1; ne++;
            }
        }
        /* trailing text up to next '<' */
        int32_t t1 = text0;
        while (t1 < n && s[t1] != '<') t1++;
        if (t1 > text0) { ev[ne*5]=0; ev[ne*5+1]=text0; ev[ne*5+2]=t1; ne++; }
        i = t1;
    }
    return ne;
}
