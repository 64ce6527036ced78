// Native columnar transition-constraint evaluator.
//
// Computes the combined transition-constraint column over the whole
// evaluation domain: for every step j it rebuilds (current, next) states
// from the strided trace samples, evaluates every decoder/stack constraint,
// and folds them into the pseudo-random linear combination.  OpenMP across
// steps.  A direct port of distaff_tpu/stark/constraints/{decoder_air,
// stack_air,evaluator}.py - golden-tested against the Python columnar path.
//
// Layout of the evaluation vector (must match the Python evaluator):
//   [0..15)  op-bit constraints        [15..19) sponge (hacc)
//   [19]     loop image                [20..20+CD) ctx stack
//   [..+LD)  loop stack                [..] 2 aux + SD user stack
//
// All tables cross the boundary as 16-byte LE u128s.

#include <cstdint>
#include <cstring>
#include <vector>

#include "field128.h"
#include "ark_constants.h"

using f128::u128;

namespace {

inline u128 fadd(u128 a, u128 b) { return f128::add(a, b); }
inline u128 fsub(u128 a, u128 b) { return f128::sub(a, b); }
inline u128 fmul(u128 a, u128 b) { return f128::mul(a, b); }
inline u128 fcube(u128 a) { return fmul(fmul(a, a), a); }
inline u128 bnot(u128 v) { return fsub(1, v); }
inline u128 is_binary(u128 v) { return fsub(fmul(v, v), v); }

struct Layout {
    int ctx_depth, loop_depth, stack_depth;     // actual depths
    int cd, ld, sd;                             // padded: max(cd,1), max(ld,1), max(sd,8)
    int num_registers;
    int n_constraints;
};

struct State {
    u128 op_counter;
    u128 sponge[4];
    u128 cf_bits[3], ld_bits[5], hd_bits[2];
    const u128* ctx;    // padded arrays
    const u128* loops;
    const u128* stack;
    u128 cf_flags[8], ld_flags[32], hd_flags[4];
    u128 begin_flag, noop_flag;

    u128 op_code() const {
        u128 r = ld_bits[0];
        r = fadd(r, fmul(ld_bits[1], 2));
        r = fadd(r, fmul(ld_bits[2], 4));
        r = fadd(r, fmul(ld_bits[3], 8));
        r = fadd(r, fmul(ld_bits[4], 16));
        r = fadd(r, fmul(hd_bits[0], 32));
        r = fadd(r, fmul(hd_bits[1], 64));
        return r;
    }

    void compute_flags() {
        u128 n0 = bnot(cf_bits[0]), n1 = bnot(cf_bits[1]);
        cf_flags[0] = fmul(n0, n1);
        cf_flags[1] = fmul(cf_bits[0], n1);
        cf_flags[2] = fmul(n0, cf_bits[1]);
        cf_flags[3] = fmul(cf_bits[0], cf_bits[1]);
        for (int i = 0; i < 4; i++) cf_flags[4 + i] = cf_flags[i];
        u128 n2 = bnot(cf_bits[2]);
        for (int i = 0; i < 4; i++) cf_flags[i] = fmul(cf_flags[i], n2);
        for (int i = 4; i < 8; i++) cf_flags[i] = fmul(cf_flags[i], cf_bits[2]);

        n0 = bnot(ld_bits[0]); n1 = bnot(ld_bits[1]);
        ld_flags[0] = fmul(n0, n1);
        ld_flags[1] = fmul(ld_bits[0], n1);
        // replicates the reference's cf_op_bits[1] term (trace_state.rs:301)
        ld_flags[2] = fmul(n0, cf_bits[1]);
        ld_flags[3] = fmul(ld_bits[0], ld_bits[1]);
        for (int i = 0; i < 4; i++) ld_flags[4 + i] = ld_flags[i];
        n2 = bnot(ld_bits[2]);
        for (int i = 0; i < 4; i++) ld_flags[i] = fmul(ld_flags[i], n2);
        for (int i = 4; i < 8; i++) ld_flags[i] = fmul(ld_flags[i], ld_bits[2]);
        for (int i = 0; i < 8; i++) ld_flags[8 + i] = ld_flags[i];
        u128 n3 = bnot(ld_bits[3]);
        for (int i = 0; i < 8; i++) ld_flags[i] = fmul(ld_flags[i], n3);
        for (int i = 8; i < 16; i++) ld_flags[i] = fmul(ld_flags[i], ld_bits[3]);
        for (int i = 0; i < 16; i++) ld_flags[16 + i] = ld_flags[i];
        u128 n4 = bnot(ld_bits[4]);
        for (int i = 0; i < 16; i++) ld_flags[i] = fmul(ld_flags[i], n4);
        for (int i = 16; i < 32; i++) ld_flags[i] = fmul(ld_flags[i], ld_bits[4]);

        n0 = bnot(hd_bits[0]); n1 = bnot(hd_bits[1]);
        hd_flags[0] = fmul(n0, n1);
        hd_flags[1] = fmul(hd_bits[0], n1);
        hd_flags[2] = fmul(n0, hd_bits[1]);
        hd_flags[3] = fmul(hd_bits[0], hd_bits[1]);

        begin_flag = fmul(ld_flags[0], hd_flags[0]);
        noop_flag = fmul(ld_flags[31], hd_flags[3]);

        hd_flags[0] = fmul(hd_flags[0], ld_bits[0]);  // PUSH fixup
        ld_flags[0] = fmul(ld_flags[0], hd_bits[0]);  // ASSERT fixup
    }
};

struct Ctx {
    const u128* trace;   // R x n row-major
    size_t n;
    Layout lay;
    const u128* dec_ark;  // 8 x cycle
    const u128* masks;    // 3 x cycle
    const u128* stk_ark;  // 12 x cycle
    size_t cycle;
};

void load_state(const Ctx& c, size_t j, State& s, std::vector<u128>& pads) {
    const u128* t = c.trace;
    size_t n = c.n;
    auto reg = [&](int r) { return t[(size_t)r * n + j]; };
    s.op_counter = reg(0);
    for (int i = 0; i < 4; i++) s.sponge[i] = reg(1 + i);
    for (int i = 0; i < 3; i++) s.cf_bits[i] = reg(5 + i);
    for (int i = 0; i < 5; i++) s.ld_bits[i] = reg(8 + i);
    for (int i = 0; i < 2; i++) s.hd_bits[i] = reg(13 + i);
    // padded stacks: copy actual registers into pads buffer (already zeroed)
    u128* ctx = pads.data();
    u128* loops = ctx + c.lay.cd;
    u128* stack = loops + c.lay.ld;
    for (int i = 0; i < c.lay.ctx_depth; i++) ctx[i] = reg(15 + i);
    for (int i = 0; i < c.lay.loop_depth; i++) loops[i] = reg(15 + c.lay.ctx_depth + i);
    for (int i = 0; i < c.lay.stack_depth; i++)
        stack[i] = reg(15 + c.lay.ctx_depth + c.lay.loop_depth + i);
    s.ctx = ctx; s.loops = loops; s.stack = stack;
    s.compute_flags();
}

// sponge MDS helpers -------------------------------------------------------------------------

void sponge_mds(const u128* mds, const u128* in, u128* out, int w) {
    for (int i = 0; i < w; i++) {
        u128 acc = 0;
        for (int k = 0; k < w; k++) acc = fadd(acc, fmul(mds[i * w + k], in[k]));
        out[i] = acc;
    }
}

// decoder constraints ------------------------------------------------------------------------

void enforce_op_bits(u128* res, const State& cur, const State& nxt, const u128* mask) {
    int i = 0;
    u128 cf_sum = 0;
    for (int k = 0; k < 3; k++) { res[i++] = is_binary(cur.cf_bits[k]); cf_sum = fadd(cf_sum, cur.cf_bits[k]); }
    u128 ld_prod = 1;
    for (int k = 0; k < 5; k++) { res[i++] = is_binary(cur.ld_bits[k]); ld_prod = fmul(ld_prod, cur.ld_bits[k]); }
    u128 hd_prod = 1;
    for (int k = 0; k < 2; k++) { res[i++] = is_binary(cur.hd_bits[k]); hd_prod = fmul(hd_prod, cur.hd_bits[k]); }

    u128 is_hacc = cur.cf_flags[0];
    u128 hacc_tr = fmul(fadd(cur.op_counter, 1), is_hacc);
    u128 rest_tr = fmul(cur.op_counter, bnot(is_hacc));
    res[i++] = fsub(fadd(hacc_tr, rest_tr), nxt.op_counter);

    res[i++] = fmul(fmul(cur.op_counter, bnot(ld_prod)), bnot(hd_prod));
    res[i++] = fmul(cf_sum, bnot(fmul(ld_prod, hd_prod)));
    res[i++] = fmul(cur.cf_flags[7], bnot(nxt.cf_flags[7]));

    u128 v = 0;
    v = fadd(v, fmul(cur.cf_flags[1], mask[1]));  // begin on 15 mod 16
    v = fadd(v, fmul(cur.cf_flags[4], mask[1]));  // loop
    v = fadd(v, fmul(cur.cf_flags[5], mask[1]));  // wrap
    v = fadd(v, fmul(cur.cf_flags[6], mask[1]));  // break
    v = fadd(v, fmul(cur.cf_flags[2], mask[0]));  // tend on 0 mod 16
    v = fadd(v, fmul(cur.cf_flags[3], mask[0]));  // fend
    v = fadd(v, fmul(cur.hd_flags[0], mask[2]));  // push on 0 mod 8
    res[i] = v;
}

void enforce_hacc(u128* res, const State& cur, const State& nxt, const u128* ark, u128 flag) {
    u128 op_value = fmul(nxt.stack[0], cur.hd_flags[0]);
    u128 old_s[4], t[4];
    for (int i = 0; i < 4; i++) old_s[i] = fcube(fadd(cur.sponge[i], ark[i]));
    sponge_mds(dtc::SPONGE_MDS, old_s, t, 4);
    t[0] = fadd(t[0], cur.op_code());
    t[1] = fadd(t[1], op_value);

    u128 new_s[4], u[4];
    u128 inv_tmp[4];
    for (int i = 0; i < 4; i++) {
        u128 acc = 0;
        for (int k = 0; k < 4; k++) acc = fadd(acc, fmul(dtc::SPONGE_INV_MDS[i * 4 + k], nxt.sponge[k]));
        inv_tmp[i] = acc;
    }
    for (int i = 0; i < 4; i++) u[i] = fcube(inv_tmp[i]);
    for (int i = 0; i < 4; i++) new_s[i] = fsub(u[i], ark[4 + i]);

    for (int i = 0; i < 4; i++) res[i] = fadd(res[i], fmul(flag, fsub(t[i], new_s[i])));
}

// shared shift/copy helpers (within a result window of length len) ---------------------------

inline void agg(u128* res, int idx, u128 flag, u128 value) {
    res[idx] = fadd(res[idx], fmul(flag, value));
}

void stack_copy(u128* res, int len, const u128* olds, const u128* news, int from, u128 flag) {
    for (int i = from; i < len; i++) agg(res, i, flag, fsub(olds[i], news[i]));
}

void right_shift(u128* res, int len, const u128* olds, const u128* news, int slots, u128 flag) {
    for (int i = slots; i < len; i++) agg(res, i, flag, fsub(olds[i - slots], news[i]));
}

void left_shift(u128* res, int len, const u128* olds, const u128* news, int from, int slots, u128 flag) {
    for (int i = from - slots; i < len - slots; i++)
        agg(res, i, flag, fsub(olds[i + slots], news[i]));
    for (int i = len - slots; i < len; i++) agg(res, i, flag, news[i]);
}

void enforce_flow(u128* res, const Ctx& c, const State& cur, const State& nxt) {
    int CD = c.lay.cd, LD = c.lay.ld;
    u128* ctx_res = res + 5;          // after 4 sponge slots + loop image slot
    u128* loop_res = ctx_res + CD;

    // begin
    {
        u128 f = cur.cf_flags[1];
        for (int i = 0; i < 4; i++) agg(res, i, f, nxt.sponge[i]);
        agg(ctx_res, 0, f, fsub(cur.sponge[0], nxt.ctx[0]));
        right_shift(ctx_res, CD, cur.ctx, nxt.ctx, 1, f);
        stack_copy(loop_res, LD, cur.loops, nxt.loops, 0, f);
    }
    // tend
    {
        u128 f = cur.cf_flags[2];
        agg(res, 0, f, fsub(cur.ctx[0], nxt.sponge[0]));
        agg(res, 1, f, fsub(cur.sponge[0], nxt.sponge[1]));
        agg(res, 3, f, nxt.sponge[3]);
        left_shift(ctx_res, CD, cur.ctx, nxt.ctx, 1, 1, f);
        stack_copy(loop_res, LD, cur.loops, nxt.loops, 0, f);
    }
    // fend
    {
        u128 f = cur.cf_flags[3];
        agg(res, 0, f, fsub(cur.ctx[0], nxt.sponge[0]));
        agg(res, 2, f, fsub(cur.sponge[0], nxt.sponge[2]));
        agg(res, 3, f, nxt.sponge[3]);
        left_shift(ctx_res, CD, cur.ctx, nxt.ctx, 1, 1, f);
        stack_copy(loop_res, LD, cur.loops, nxt.loops, 0, f);
    }
    // loop
    {
        u128 f = cur.cf_flags[4];
        for (int i = 0; i < 4; i++) agg(res, i, f, nxt.sponge[i]);
        agg(ctx_res, 0, f, fsub(cur.sponge[0], nxt.ctx[0]));
        right_shift(ctx_res, CD, cur.ctx, nxt.ctx, 1, f);
        right_shift(loop_res, LD, cur.loops, nxt.loops, 1, f);
    }
    // wrap
    {
        u128 f = cur.cf_flags[5];
        for (int i = 0; i < 4; i++) agg(res, i, f, nxt.sponge[i]);
        agg(res, 4, f, fsub(cur.sponge[0], cur.loops[0]));
        stack_copy(ctx_res, CD, cur.ctx, nxt.ctx, 0, f);
        stack_copy(loop_res, LD, cur.loops, nxt.loops, 0, f);
    }
    // break
    {
        u128 f = cur.cf_flags[6];
        for (int i = 0; i < 4; i++) agg(res, i, f, fsub(cur.sponge[i], nxt.sponge[i]));
        agg(res, 4, f, fsub(cur.sponge[0], cur.loops[0]));
        stack_copy(ctx_res, CD, cur.ctx, nxt.ctx, 0, f);
        left_shift(loop_res, LD, cur.loops, nxt.loops, 1, 1, f);
    }
    // void
    {
        u128 f = cur.cf_flags[7];
        for (int i = 0; i < 4; i++) agg(res, i, f, fsub(cur.sponge[i], nxt.sponge[i]));
        stack_copy(ctx_res, CD, cur.ctx, nxt.ctx, 0, f);
        stack_copy(loop_res, LD, cur.loops, nxt.loops, 0, f);
    }
}

// stack constraints --------------------------------------------------------------------------

void enforce_stack(u128* aux, u128* res, int len, const Ctx& c, const State& cur,
                   const State& nxt, const u128* ark) {
    const u128* olds = cur.stack;
    const u128* news = nxt.stack;
    const u128* ld = cur.ld_flags;
    const u128* hd = cur.hd_flags;

    // assert (ld 0)
    left_shift(res, len, olds, news, 1, 1, ld[0]);
    agg(aux, 0, ld[0], fsub(1, olds[0]));
    // asserteq (ld 1)
    left_shift(res, len, olds, news, 2, 2, ld[1]);
    agg(aux, 0, ld[1], fsub(olds[0], olds[1]));
    // read (ld 16)
    right_shift(res, len, olds, news, 1, ld[16]);
    // read2 (ld 17)
    right_shift(res, len, olds, news, 2, ld[17]);
    // dup (ld 18)
    agg(res, 0, ld[18], fsub(news[0], olds[0]));
    right_shift(res, len, olds, news, 1, ld[18]);
    // dup2 (ld 19)
    agg(res, 0, ld[19], fsub(news[0], olds[0]));
    agg(res, 1, ld[19], fsub(news[1], olds[1]));
    right_shift(res, len, olds, news, 2, ld[19]);
    // dup4 (ld 20)
    for (int i = 0; i < 4; i++) agg(res, i, ld[20], fsub(news[i], olds[i]));
    right_shift(res, len, olds, news, 4, ld[20]);
    // pad2 (ld 21)
    agg(res, 0, ld[21], news[0]);
    agg(res, 1, ld[21], news[1]);
    right_shift(res, len, olds, news, 2, ld[21]);
    // drop (ld 3)
    left_shift(res, len, olds, news, 1, 1, ld[3]);
    // drop4 (ld 4)
    left_shift(res, len, olds, news, 4, 4, ld[4]);
    // swap (ld 24): both terms aggregate into slot 0 (reference behavior)
    agg(res, 0, ld[24], fsub(news[0], olds[1]));
    agg(res, 0, ld[24], fsub(news[1], olds[0]));
    stack_copy(res, len, olds, news, 2, ld[24]);
    // swap2 (ld 25)
    agg(res, 0, ld[25], fsub(news[0], olds[2]));
    agg(res, 1, ld[25], fsub(news[1], olds[3]));
    agg(res, 2, ld[25], fsub(news[2], olds[0]));
    agg(res, 3, ld[25], fsub(news[3], olds[1]));
    stack_copy(res, len, olds, news, 4, ld[25]);
    // swap4 (ld 26)
    for (int i = 0; i < 4; i++) {
        agg(res, i, ld[26], fsub(news[i], olds[i + 4]));
        agg(res, i + 4, ld[26], fsub(news[i + 4], olds[i]));
    }
    stack_copy(res, len, olds, news, 8, ld[26]);
    // roll4 (ld 27)
    agg(res, 0, ld[27], fsub(news[0], olds[3]));
    for (int i = 0; i < 3; i++) agg(res, i + 1, ld[27], fsub(news[i + 1], olds[i]));
    stack_copy(res, len, olds, news, 4, ld[27]);
    // roll8 (ld 28)
    agg(res, 0, ld[28], fsub(news[0], olds[7]));
    for (int i = 0; i < 7; i++) agg(res, i + 1, ld[28], fsub(news[i + 1], olds[i]));
    stack_copy(res, len, olds, news, 8, ld[28]);
    // add (ld 8)
    agg(res, 0, ld[8], fsub(news[0], fadd(olds[0], olds[1])));
    left_shift(res, len, olds, news, 2, 1, ld[8]);
    // mul (ld 9)
    agg(res, 0, ld[9], fsub(news[0], fmul(olds[0], olds[1])));
    left_shift(res, len, olds, news, 2, 1, ld[9]);
    // inv (ld 12)
    agg(res, 0, ld[12], fsub(1, fmul(news[0], olds[0])));
    stack_copy(res, len, olds, news, 1, ld[12]);
    // neg (ld 13)
    agg(res, 0, ld[13], fadd(news[0], olds[0]));
    stack_copy(res, len, olds, news, 1, ld[13]);
    // not (ld 14)
    agg(res, 0, ld[14], fsub(news[0], bnot(olds[0])));
    stack_copy(res, len, olds, news, 1, ld[14]);
    agg(aux, 0, ld[14], is_binary(olds[0]));
    // and (ld 10)
    agg(res, 0, ld[10], fsub(news[0], fmul(olds[0], olds[1])));
    left_shift(res, len, olds, news, 2, 1, ld[10]);
    agg(aux, 0, ld[10], is_binary(olds[0]));
    agg(aux, 1, ld[10], is_binary(olds[1]));
    // or (ld 11)
    agg(res, 0, ld[11], fsub(news[0], bnot(fmul(bnot(olds[0]), bnot(olds[1])))));
    left_shift(res, len, olds, news, 2, 1, ld[11]);
    agg(aux, 0, ld[11], is_binary(olds[0]));
    agg(aux, 1, ld[11], is_binary(olds[1]));
    // eq (ld 2)
    {
        u128 diff = fsub(olds[1], olds[2]);
        u128 op_result = bnot(fmul(diff, olds[0]));
        agg(res, 0, ld[2], fsub(news[0], op_result));
        left_shift(res, len, olds, news, 3, 2, ld[2]);
        agg(aux, 0, ld[2], fmul(news[0], diff));
    }
    // binacc (ld 29)
    {
        u128 f = ld[29];
        u128 bit = news[0];
        agg(res, 0, f, is_binary(bit));
        agg(res, 1, f, news[1]);
        agg(res, 2, f, fsub(news[2], fmul(olds[2], 2)));
        agg(res, 3, f, fsub(news[3], fadd(olds[3], fmul(bit, olds[2]))));
        stack_copy(res, len, olds, news, 4, f);
    }
    // choose (ld 5)
    {
        u128 f = ld[5];
        u128 cnd = olds[2], nc = bnot(cnd);
        agg(res, 0, f, fsub(news[0], fadd(fmul(cnd, olds[0]), fmul(nc, olds[1]))));
        left_shift(res, len, olds, news, 3, 2, f);
        agg(aux, 0, f, is_binary(cnd));
    }
    // choose2 (ld 6)
    {
        u128 f = ld[6];
        u128 cnd = olds[4], nc = bnot(cnd);
        agg(res, 0, f, fsub(news[0], fadd(fmul(cnd, olds[0]), fmul(nc, olds[2]))));
        agg(res, 1, f, fsub(news[1], fadd(fmul(cnd, olds[1]), fmul(nc, olds[3]))));
        left_shift(res, len, olds, news, 6, 4, f);
        agg(aux, 0, f, is_binary(cnd));
    }
    // cswap2 (ld 7)
    {
        u128 f = ld[7];
        u128 cnd = olds[4], nc = bnot(cnd);
        agg(res, 0, f, fsub(news[0], fadd(fmul(cnd, olds[2]), fmul(nc, olds[0]))));
        agg(res, 1, f, fsub(news[1], fadd(fmul(cnd, olds[3]), fmul(nc, olds[1]))));
        agg(res, 2, f, fsub(news[2], fadd(fmul(cnd, olds[0]), fmul(nc, olds[2]))));
        agg(res, 3, f, fsub(news[3], fadd(fmul(cnd, olds[1]), fmul(nc, olds[3]))));
        left_shift(res, len, olds, news, 6, 2, f);
        agg(aux, 0, f, is_binary(cnd));
    }
    // push (hd 0)
    right_shift(res, len, olds, news, 1, hd[0]);
    // cmp (hd 1)
    {
        u128 f = hd[1];
        u128 x_bit = news[1], y_bit = news[2];
        agg(res, 0, f, is_binary(x_bit));
        agg(res, 1, f, is_binary(y_bit));
        u128 not_set = news[3];
        u128 bit_gt = fmul(x_bit, bnot(y_bit));
        u128 bit_lt = fmul(y_bit, bnot(x_bit));
        agg(res, 2, f, fsub(news[4], fadd(olds[4], fmul(bit_gt, not_set))));
        agg(res, 3, f, fsub(news[5], fadd(olds[5], fmul(bit_lt, not_set))));
        u128 p2 = olds[0];
        agg(res, 4, f, fsub(news[6], fadd(olds[6], fmul(y_bit, p2))));
        agg(res, 5, f, fsub(news[7], fadd(olds[7], fmul(x_bit, p2))));
        agg(res, 6, f, fsub(not_set, fmul(bnot(olds[5]), bnot(olds[4]))));
        agg(res, 7, f, fsub(fmul(news[0], 2), p2));
        stack_copy(res, len, olds, news, 8, f);
    }
    // rescr (hd 2)
    {
        u128 f = hd[2];
        u128 old_state[6], t[6];
        for (int i = 0; i < 6; i++) old_state[i] = fcube(fadd(olds[i], ark[i]));
        sponge_mds(dtc::HASHER_MDS, old_state, t, 6);
        u128 inv_t[6], u[6];
        for (int i = 0; i < 6; i++) {
            u128 acc = 0;
            for (int k = 0; k < 6; k++)
                acc = fadd(acc, fmul(dtc::HASHER_INV_MDS[i * 6 + k], news[k]));
            inv_t[i] = acc;
        }
        for (int i = 0; i < 6; i++) u[i] = fsub(fcube(inv_t[i]), ark[6 + i]);
        for (int i = 0; i < 6; i++) agg(res, i, f, fsub(u[i], t[i]));
        stack_copy(res, len, olds, news, 6, f);
    }
    // begin / noop composite: stack must not change
    stack_copy(res, len, olds, news, 0, cur.begin_flag);
    stack_copy(res, len, olds, news, 0, cur.noop_flag);
}

}  // namespace

extern "C" {

// Evaluate the combined transition constraint column.
//   trace:      R x n u128 (strided evaluation-domain samples, row-major)
//   dec_ark:    8 x cycle; masks: 3 x cycle; stk_ark: 12 x cycle
//   cc:         coefficient pairs in group-consumption order (2 per constraint)
//   group_idx:  constraint indices in consumption order (n_constraints)
//   group_size: constraints per degree group (n_groups)
//   xp:         n_groups x n degree-adjustment columns x^p_g
//   out:        n combined values
void dt_eval_transition(
    const uint8_t* trace_bytes, size_t n, size_t num_registers,
    size_t ctx_depth, size_t loop_depth, size_t stack_depth,
    const uint8_t* dec_ark_bytes, const uint8_t* masks_bytes,
    const uint8_t* stk_ark_bytes, size_t cycle,
    const uint8_t* cc_bytes, const uint32_t* group_idx,
    const uint32_t* group_size, size_t n_groups,
    const uint8_t* xp_bytes, uint8_t* out_bytes) {

    Ctx c;
    c.trace = (const u128*)trace_bytes;
    c.n = n;
    c.lay.ctx_depth = (int)ctx_depth;
    c.lay.loop_depth = (int)loop_depth;
    c.lay.stack_depth = (int)stack_depth;
    c.lay.cd = ctx_depth > 1 ? (int)ctx_depth : 1;
    c.lay.ld = loop_depth > 1 ? (int)loop_depth : 1;
    c.lay.sd = stack_depth > 8 ? (int)stack_depth : 8;
    c.lay.num_registers = (int)num_registers;
    c.dec_ark = (const u128*)dec_ark_bytes;
    c.masks = (const u128*)masks_bytes;
    c.stk_ark = (const u128*)stk_ark_bytes;
    c.cycle = cycle;

    int n_dec = 20 + c.lay.cd + c.lay.ld;
    int n_stk = 2 + (int)stack_depth;
    int n_constraints = n_dec + n_stk;
    c.lay.n_constraints = n_constraints;

    const u128* cc = (const u128*)cc_bytes;
    const u128* xp = (const u128*)xp_bytes;
    u128* out = (u128*)out_bytes;

#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<u128> pads_cur(c.lay.cd + c.lay.ld + c.lay.sd);
        std::vector<u128> pads_nxt(c.lay.cd + c.lay.ld + c.lay.sd);
        std::vector<u128> evals(n_constraints);
        std::vector<u128> stack_evals(c.lay.sd);

#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
        for (size_t j = 0; j < n; j++) {
            std::fill(pads_cur.begin(), pads_cur.end(), (u128)0);
            std::fill(pads_nxt.begin(), pads_nxt.end(), (u128)0);
            std::fill(evals.begin(), evals.end(), (u128)0);
            std::fill(stack_evals.begin(), stack_evals.end(), (u128)0);

            State cur, nxt;
            load_state(c, j, cur, pads_cur);
            load_state(c, (j + 8) % n, nxt, pads_nxt);

            size_t ci = j % c.cycle;
            u128 dec_ark[8], mask[3], stk_ark[12];
            for (int k = 0; k < 8; k++) dec_ark[k] = c.dec_ark[k * c.cycle + ci];
            for (int k = 0; k < 3; k++) mask[k] = c.masks[k * c.cycle + ci];
            for (int k = 0; k < 12; k++) stk_ark[k] = c.stk_ark[k * c.cycle + ci];

            enforce_op_bits(evals.data(), cur, nxt, mask);
            u128* dec_res = evals.data() + 15;
            enforce_hacc(dec_res, cur, nxt, dec_ark, cur.cf_flags[0]);
            enforce_flow(dec_res, c, cur, nxt);

            u128* aux = evals.data() + n_dec;
            enforce_stack(aux, stack_evals.data(), c.lay.sd, c, cur, nxt, stk_ark);
            for (int k = 0; k < (int)stack_depth; k++) evals[n_dec + 2 + k] = stack_evals[k];

            // pseudo-random linear combination by degree groups
            u128 result = 0;
            size_t i = 0, gstart = 0;
            for (size_t g = 0; g < n_groups; g++) {
                u128 adj = 0;
                for (uint32_t k = 0; k < group_size[g]; k++) {
                    u128 e = evals[group_idx[gstart + k]];
                    result = fadd(result, fmul(e, cc[i * 2]));
                    adj = fadd(adj, fmul(e, cc[i * 2 + 1]));
                    i++;
                }
                gstart += group_size[g];
                result = fadd(result, fmul(adj, xp[g * n + j]));
            }
            out[j] = result;
        }
    }
}

}  // extern "C"
