// Native beam-search decoder core: ARPA n-gram LM + lexicon trie +
// CTC/ASG token-passing beam search.
//
// This is the TPU framework's equivalent of the reference's native decoder
// stack (fl::lib::text: KenLM wrapper, Trie, LexiconDecoder /
// LexiconFreeDecoder — call sites cpc/Decode.cpp:242-624 and
// inference/decoder/Decoder.cpp). Semantics intentionally match the Python
// implementation in wav2letter_tpu/decoder/ (beam.py, lm.py, trie.py) —
// the two are differentially tested; this core exists because beam search
// is pointer-chasing host code where C++ is ~100x Python.
//
// Exposed as a C API consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <limits>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

static inline double logadd(double a, double b) {
  if (a < b) std::swap(a, b);
  if (b == kNegInf) return a;
  return a + std::log1p(std::exp(b - a));
}

// ---------------------------------------------------------------------------
// ARPA n-gram LM with backoff (log10 scores, KenLM convention)
// ---------------------------------------------------------------------------
struct NgramLM {
  int order = 0;
  std::unordered_map<std::string, int> vocab;
  // per-order maps: key = packed int32 word ids
  std::vector<std::unordered_map<std::string, std::pair<float, float>>> tables;
  int unk_id = -1, bos_id = -1, eos_id = -1;

  static std::string key(const int32_t* ids, int n) {
    return std::string(reinterpret_cast<const char*>(ids), n * sizeof(int32_t));
  }

  int word_id(const std::string& w) {
    auto it = vocab.find(w);
    if (it != vocab.end()) return it->second;
    int id = (int)vocab.size();
    vocab.emplace(w, id);
    return id;
  }

  bool load_arpa(const std::string& path) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    int section = -1;  // -1 none, 0 data, n>=1 grams
    while (std::getline(f, line)) {
      // trim \r
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
        line.pop_back();
      if (line.empty()) continue;
      if (line.rfind("\\data\\", 0) == 0) { section = 0; continue; }
      if (line[0] == '\\' && line.find("-grams:") != std::string::npos) {
        section = std::stoi(line.substr(1, line.find('-') - 1));
        while ((int)tables.size() < section) tables.emplace_back();
        continue;
      }
      if (line.rfind("\\end\\", 0) == 0) break;
      if (section <= 0) continue;
      // parse: logp \t w1 w2 ... \t [backoff]   (tabs or spaces)
      std::istringstream ss(line);
      float logp;
      if (!(ss >> logp)) continue;
      std::vector<int32_t> ids(section);
      std::string w;
      bool ok = true;
      for (int i = 0; i < section; i++) {
        if (!(ss >> w)) { ok = false; break; }
        ids[i] = word_id(w);
      }
      if (!ok) continue;
      float bo = 0.f;
      ss >> bo;  // absent -> stays 0
      tables[section - 1].emplace(key(ids.data(), section), std::make_pair(logp, bo));
    }
    order = (int)tables.size();
    auto it = vocab.find("<unk>");
    unk_id = it == vocab.end() ? -1 : it->second;
    it = vocab.find("<s>");
    bos_id = it == vocab.end() ? -1 : it->second;
    it = vocab.find("</s>");
    eos_id = it == vocab.end() ? -1 : it->second;
    return order > 0;
  }

  const std::pair<float, float>* lookup(const int32_t* ids, int n) const {
    if (n < 1 || n > order) return nullptr;
    auto& t = tables[n - 1];
    auto it = t.find(key(ids, n));
    return it == t.end() ? nullptr : &it->second;
  }

  // log10 P(w | hist) with backoff; hist length <= order-1
  float score(const int32_t* hist, int hn, int32_t w) const {
    if (w < 0) w = unk_id;  // OOV -> <unk>, then the normal backoff chain
    if (w < 0) return -10.f;
    float total_bo = 0.f;
    // start from longest usable context
    int start = std::max(0, hn - (order - 1));
    std::vector<int32_t> buf(hist + start, hist + hn);
    while (true) {
      buf.push_back(w);
      auto e = lookup(buf.data(), (int)buf.size());
      buf.pop_back();
      if (e) return e->first + total_bo;
      if (buf.empty()) {
        auto u = lookup(&w, 1);
        if (u) return u->first + total_bo;
        if (unk_id >= 0) {
          int32_t uu = unk_id;
          auto e2 = lookup(&uu, 1);
          if (e2) return e2->first + total_bo;
        }
        return -10.f + total_bo;
      }
      auto b = lookup(buf.data(), (int)buf.size());
      if (b) total_bo += b->second;
      buf.erase(buf.begin());
    }
  }
};

// LM state = up to (order-1) word ids, interned so states can be compared
// by id (hyp merging).
struct LMStatePool {
  std::unordered_map<std::string, int> ids;
  std::vector<std::vector<int32_t>> states;
  int intern(const int32_t* w, int n) {
    std::string k(reinterpret_cast<const char*>(w), n * sizeof(int32_t));
    auto it = ids.find(k);
    if (it != ids.end()) return it->second;
    int id = (int)states.size();
    ids.emplace(std::move(k), id);
    states.emplace_back(w, w + n);
    return id;
  }
};

// ---------------------------------------------------------------------------
// Lexicon trie (flattened) with smearing
// ---------------------------------------------------------------------------
struct TrieNode {
  std::unordered_map<int, int> children;  // token -> node index
  std::vector<int> labels;                // word ids
  std::vector<float> scores;
  float max_score = 0.f;
};

struct Trie {
  std::vector<TrieNode> nodes;  // node 0 = root
  Trie() { nodes.emplace_back(); }

  int insert(const int32_t* toks, int n, int word, float score) {
    int cur = 0;
    for (int i = 0; i < n; i++) {
      auto& ch = nodes[cur].children;
      auto it = ch.find(toks[i]);
      if (it == ch.end()) {
        int idx = (int)nodes.size();
        ch.emplace(toks[i], idx);
        nodes.emplace_back();
        cur = idx;
      } else {
        cur = it->second;
      }
    }
    nodes[cur].labels.push_back(word);
    nodes[cur].scores.push_back(score);
    return cur;
  }

  // smear: 0 none, 1 max, 2 logadd (iterative post-order)
  void smear(int mode) {
    if (mode == 0) return;
    std::vector<std::pair<int, bool>> stack{{0, false}};
    while (!stack.empty()) {
      auto [ni, done] = stack.back();
      stack.pop_back();
      if (!done) {
        stack.push_back({ni, true});
        for (auto& kv : nodes[ni].children) stack.push_back({kv.second, false});
        continue;
      }
      auto& nd = nodes[ni];
      double acc = kNegInf;
      bool any = false;
      for (float s : nd.scores) {
        acc = (mode == 1) ? std::max(acc, (double)s) : (any ? logadd(acc, s) : s);
        any = true;
      }
      for (auto& kv : nodes[ni].children) {
        double cs = nodes[kv.second].max_score;
        acc = (mode == 1) ? std::max(acc, cs) : (any ? logadd(acc, cs) : cs);
        any = true;
      }
      nd.max_score = any ? (float)acc : (float)kNegInf;
    }
  }
};

// ---------------------------------------------------------------------------
// beam decoder
// ---------------------------------------------------------------------------
struct DecoderOptions {
  int beam_size = 2500;
  int beam_size_token = 250000;
  double beam_threshold = 25.0;
  double lm_weight = 0.0;
  double word_score = 0.0;
  double unk_score = kNegInf;
  double sil_score = 0.0;
  int log_add = 0;
  int criterion = 0;  // 0 CTC, 1 ASG
};

struct Hyp {
  double score;
  double am_score;
  double lm_score;
  int lm_state;
  int node;  // trie node (-1 lexicon-free)
  int parent;  // index into prev frame's hyp arena
  int token;
  int word;  // emitted word this step (-1)
  bool prev_blank;
};

struct Decoder {
  DecoderOptions opts;
  Trie* trie = nullptr;           // may be null (lexicon-free)
  NgramLM* lm = nullptr;          // may be null (zero LM)
  LMStatePool pool;
  int sil = 0, blank = -1, unk_word = -1;
  std::vector<float> transitions;  // N*N or empty
  int n_tokens = 0;
  bool is_token_lm = false;
  std::vector<int32_t> usr_to_lm;  // word idx (or token idx) -> LM word id

  // lattice: per-frame hypothesis arrays
  std::vector<std::vector<Hyp>> frames;

  double trans(int to, int from) const {
    if (transitions.empty() || from < 0) return 0.0;
    return transitions[to * n_tokens + from];
  }

  int lm_start_state() {
    if (!lm || lm->bos_id < 0) return pool.intern(nullptr, 0);
    int32_t b = lm->bos_id;
    return pool.intern(&b, 1);
  }

  std::pair<int, float> lm_score(int state, int32_t usr_idx) {
    if (!lm) return {state, 0.f};
    int32_t w = (usr_idx >= 0 && usr_idx < (int)usr_to_lm.size())
                    ? usr_to_lm[usr_idx]
                    : usr_idx;
    auto& h = pool.states[state];
    float s = lm->score(h.data(), (int)h.size(), w);
    // next state: (h + w) truncated to order-1
    std::vector<int32_t> nh(h);
    nh.push_back(w);
    int keep = std::max(0, lm->order - 1);
    if ((int)nh.size() > keep) nh.erase(nh.begin(), nh.end() - keep);
    return {pool.intern(nh.data(), (int)nh.size()), s};
  }

  float lm_finish(int state) {
    if (!lm || lm->eos_id < 0) return 0.f;
    auto& h = pool.states[state];
    return lm->score(h.data(), (int)h.size(), lm->eos_id);
  }

  void begin() {
    frames.clear();
    frames.emplace_back();
    Hyp h{0.0, 0.0, 0.0, lm_start_state(), trie ? 0 : -1, -1, sil, -1, false};
    frames.back().push_back(h);
  }

  // candidate merging: key = (lm_state, node, prev_blank)
  struct KeyHash {
    size_t operator()(const std::tuple<int, int, bool>& k) const {
      auto [a, b, c] = k;
      return std::hash<int64_t>()(((int64_t)a << 24) ^ ((int64_t)b << 1) ^ c);
    }
  };

  void add_cand(
      std::unordered_map<std::tuple<int, int, bool>, int, KeyHash>& keys,
      std::vector<Hyp>& cands, const Hyp& h, double& best) {
    best = std::max(best, h.score);
    auto k = std::make_tuple(h.lm_state, h.node, h.prev_blank);
    auto it = keys.find(k);
    if (it == keys.end()) {
      keys.emplace(k, (int)cands.size());
      cands.push_back(h);
      return;
    }
    Hyp& old = cands[it->second];
    if (opts.log_add) {
      double m = logadd(old.score, h.score);
      if (h.score > old.score) { Hyp t = h; t.score = m; old = t; }
      else old.score = m;
      best = std::max(best, m);
    } else if (h.score > old.score) {
      old = h;
    }
  }

  void step_frame(const float* em) {
    const auto& prev = frames.back();
    std::unordered_map<std::tuple<int, int, bool>, int, KeyHash> keys;
    std::vector<Hyp> cands;
    cands.reserve(prev.size() * 8);
    double best = kNegInf;
    const bool ctc = opts.criterion == 0;

    // top-k tokens
    std::vector<int> top(n_tokens);
    for (int i = 0; i < n_tokens; i++) top[i] = i;
    int k = std::min(opts.beam_size_token, n_tokens);
    if (k < n_tokens) {
      std::partial_sort(top.begin(), top.begin() + k, top.end(),
                        [&](int a, int b) { return em[a] > em[b]; });
      top.resize(k);
    }

    for (int pi = 0; pi < (int)prev.size(); pi++) {
      const Hyp& hyp = prev[pi];
      for (int tok : top) {
        double am = em[tok];
        double base = hyp.score + am;
        if (ctc && tok == blank) {
          Hyp nh{base, hyp.am_score + am, hyp.lm_score, hyp.lm_state,
                 hyp.node, pi, tok, -1, true};
          add_cand(keys, cands, nh, best);
          continue;
        }
        if (tok == hyp.token && (!ctc || !hyp.prev_blank)) {
          Hyp nh{base + trans(tok, hyp.token), hyp.am_score + am, hyp.lm_score,
                 hyp.lm_state, hyp.node, pi, tok, -1, false};
          add_cand(keys, cands, nh, best);
          continue;
        }
        if (tok == sil && sil != blank && trie) {
          Hyp nh{base + opts.sil_score + trans(tok, hyp.token),
                 hyp.am_score + am, hyp.lm_score, hyp.lm_state, 0, pi, tok, -1,
                 false};
          add_cand(keys, cands, nh, best);
          continue;
        }
        if (trie) {
          const auto& nd = trie->nodes[hyp.node];
          auto it = nd.children.find(tok);
          if (it == nd.children.end()) continue;
          int ci = it->second;
          const auto& child = trie->nodes[ci];
          double sc = base + trans(tok, hyp.token);
          double lm_sc = hyp.lm_score;
          int lst = hyp.lm_state;
          if (opts.lm_weight != 0.0 && !is_token_lm) {
            double delta = child.max_score - nd.max_score;
            sc += opts.lm_weight * delta;
            lm_sc += delta;
          }
          if (opts.lm_weight != 0.0 && is_token_lm) {
            auto [st2, s] = lm_score(lst, tok);
            lst = st2;
            sc += opts.lm_weight * s;
            lm_sc += s;
          }
          // word emissions
          for (size_t wi = 0; wi < child.labels.size(); wi++) {
            int w = child.labels[wi];
            double wsc = sc;
            double wlm = lm_sc;
            int wst = lst;
            if (opts.lm_weight != 0.0 && !is_token_lm) {
              auto [st2, s] = lm_score(hyp.lm_state, w);
              wst = st2;
              wsc += opts.lm_weight * ((double)s - child.max_score);
              wlm = hyp.lm_score + s;
            }
            if (w == unk_word) {
              if (opts.unk_score == kNegInf) continue;
              wsc += opts.unk_score;
            }
            wsc += opts.word_score;
            Hyp nh{wsc, hyp.am_score + am, wlm, wst, 0, pi, tok, w, false};
            add_cand(keys, cands, nh, best);
          }
          if (!child.children.empty()) {
            Hyp nh{sc, hyp.am_score + am, lm_sc, lst, ci, pi, tok, -1, false};
            add_cand(keys, cands, nh, best);
          }
        } else {
          // lexicon-free: token-level LM
          double sc = base + trans(tok, hyp.token);
          double lm_sc = hyp.lm_score;
          int lst = hyp.lm_state;
          if (opts.lm_weight != 0.0) {
            auto [st2, s] = lm_score(lst, tok);
            lst = st2;
            sc += opts.lm_weight * s;
            lm_sc += s;
          }
          if (tok == sil) sc += opts.sil_score;
          Hyp nh{sc, hyp.am_score + am, lm_sc, lst, tok /* node slot stores
                 last token for merge key in lexicon-free mode */,
                 pi, tok, -1, false};
          add_cand(keys, cands, nh, best);
        }
      }
    }
    // threshold + top beam_size
    double thr = best - opts.beam_threshold;
    std::vector<Hyp> kept;
    kept.reserve(cands.size());
    for (auto& h : cands)
      if (h.score >= thr) kept.push_back(h);
    if ((int)kept.size() > opts.beam_size) {
      std::partial_sort(kept.begin(), kept.begin() + opts.beam_size, kept.end(),
                        [](const Hyp& a, const Hyp& b) { return a.score > b.score; });
      kept.resize(opts.beam_size);
    } else {
      std::sort(kept.begin(), kept.end(),
                [](const Hyp& a, const Hyp& b) { return a.score > b.score; });
    }
    frames.push_back(std::move(kept));
  }

  void end() {
    auto fin = frames.back();  // copy
    for (auto& h : fin) {
      if (opts.lm_weight != 0.0 && !is_token_lm) {
        float s = lm_finish(h.lm_state);
        h.score += opts.lm_weight * s;
        h.lm_score += s;
      } else if (opts.lm_weight != 0.0 && is_token_lm) {
        float s = lm_finish(h.lm_state);
        h.score += opts.lm_weight * s;
        h.lm_score += s;
      }
      // parent points into the previous frame which is frames.back();
      // mark with parent index unchanged and flag via node = -2? keep simple:
    }
    std::sort(fin.begin(), fin.end(),
              [](const Hyp& a, const Hyp& b) { return a.score > b.score; });
    // store as a final frame whose parents reference the last step frame
    // directly (parent indices are hypothesis indices in frames[T-1]... but
    // we copied — fix parents to point at themselves in the previous frame)
    for (size_t i = 0; i < fin.size(); i++) {
      // find original index: parent chain stays valid because we copied the
      // hyps including their parent fields; but THIS frame's hyps' parents
      // must reference the frame before the final frame. They currently
      // reference frames[T-2] (set during step). Since we copied from
      // frames.back() (frame T-1), their own position changed but parent
      // fields still point correctly into frame T-2 only for backtracking
      // FROM frame T-1. To keep backtrack simple we instead record the
      // mapping: final hyp i corresponds to original hyp with same parent/
      // token/word — we push a frame where each hyp's parent is its original
      // index in frame T-1.
    }
    // simpler: recompute — find for each fin hyp its source index by pointer
    // comparison is lost after copy; instead we re-run: attach parent = index
    // of identical hyp in frames.back(). Identity: compare all fields except
    // score/lm adjustments. We stored original order before sort? Use a map
    // from (parent,token,word,lm_state,node,prev_blank) -> index.
    std::unordered_map<std::string, int> srcmap;
    const auto& last = frames.back();
    for (int i = 0; i < (int)last.size(); i++) {
      const Hyp& h = last[i];
      std::ostringstream k;
      k << h.parent << ':' << h.token << ':' << h.word << ':' << h.lm_state
        << ':' << h.node << ':' << h.prev_blank;
      srcmap.emplace(k.str(), i);
    }
    for (auto& h : fin) {
      std::ostringstream k;
      k << h.parent << ':' << h.token << ':' << h.word << ':' << h.lm_state
        << ':' << h.node << ':' << h.prev_blank;
      auto it = srcmap.find(k.str());
      h.parent = it == srcmap.end() ? -1 : it->second;
    }
    frames.push_back(std::move(fin));
  }

  // backtrack hypothesis hi at the final frame into tokens/words
  void backtrack(int hi, std::vector<int>& tokens, std::vector<int>& words) const {
    tokens.clear();
    words.clear();
    int T = (int)frames.size() - 1;  // final frame index
    if (T < 1) return;
    const Hyp* h = &frames[T][hi];
    // final frame hyp's parent = index in frame T-1 of the same hyp
    int fi = h->parent;
    if (fi < 0) return;
    for (int t = T - 1; t >= 1; t--) {
      const Hyp& cur = frames[t][fi];
      tokens.push_back(cur.token);
      words.push_back(cur.word);
      fi = cur.parent;
      if (fi < 0) break;
    }
    std::reverse(tokens.begin(), tokens.end());
    std::reverse(words.begin(), words.end());
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------
extern "C" {

void* w2l_lm_load(const char* arpa_path) {
  auto* lm = new NgramLM();
  if (!lm->load_arpa(arpa_path)) {
    delete lm;
    return nullptr;
  }
  return lm;
}

void w2l_lm_free(void* lm) { delete static_cast<NgramLM*>(lm); }

int w2l_lm_word_id(void* lm_, const char* word) {
  auto* lm = static_cast<NgramLM*>(lm_);
  auto it = lm->vocab.find(word);
  return it == lm->vocab.end() ? -1 : it->second;
}

int w2l_lm_unk_id(void* lm_) { return static_cast<NgramLM*>(lm_)->unk_id; }

float w2l_lm_score_seq(void* lm_, const int32_t* ids, int n) {
  // sentence log10 prob incl. </s> (utility / perplexity checks)
  auto* lm = static_cast<NgramLM*>(lm_);
  std::vector<int32_t> hist;
  if (lm->bos_id >= 0) hist.push_back(lm->bos_id);
  float total = 0;
  for (int i = 0; i < n; i++) {
    total += lm->score(hist.data(), (int)hist.size(), ids[i]);
    hist.push_back(ids[i]);
    int keep = std::max(0, lm->order - 1);
    if ((int)hist.size() > keep) hist.erase(hist.begin(), hist.end() - keep);
  }
  if (lm->eos_id >= 0)
    total += lm->score(hist.data(), (int)hist.size(), lm->eos_id);
  return total;
}

void* w2l_trie_new() { return new Trie(); }
void w2l_trie_free(void* t) { delete static_cast<Trie*>(t); }

void w2l_trie_insert(void* t, const int32_t* toks, int n, int word, float score) {
  static_cast<Trie*>(t)->insert(toks, n, word, score);
}

void w2l_trie_smear(void* t, int mode) { static_cast<Trie*>(t)->smear(mode); }

void* w2l_decoder_new(
    int beam_size, int beam_size_token, double beam_threshold,
    double lm_weight, double word_score, double unk_score, double sil_score,
    int log_add, int criterion, void* trie, void* lm, int sil, int blank,
    int unk_word, const float* transitions, int n_tokens,
    const int32_t* usr_to_lm, int n_usr, int is_token_lm) {
  auto* d = new Decoder();
  d->opts = {beam_size, beam_size_token, beam_threshold, lm_weight,
             word_score,
             unk_score > 1e29 || unk_score < -1e29 ? kNegInf : unk_score,
             sil_score, log_add, criterion};
  if (unk_score <= -1e29) d->opts.unk_score = kNegInf;
  d->trie = static_cast<Trie*>(trie);
  d->lm = static_cast<NgramLM*>(lm);
  d->sil = sil;
  d->blank = blank;
  d->unk_word = unk_word;
  d->n_tokens = n_tokens;
  d->is_token_lm = is_token_lm != 0;
  if (transitions) d->transitions.assign(transitions, transitions + n_tokens * n_tokens);
  if (usr_to_lm && n_usr > 0) d->usr_to_lm.assign(usr_to_lm, usr_to_lm + n_usr);
  return d;
}

void w2l_decoder_free(void* d) { delete static_cast<Decoder*>(d); }

void w2l_decoder_begin(void* d) { static_cast<Decoder*>(d)->begin(); }

void w2l_decoder_step(void* d_, const float* emissions, int t, int n) {
  auto* d = static_cast<Decoder*>(d_);
  for (int i = 0; i < t; i++) d->step_frame(emissions + (size_t)i * n);
}

void w2l_decoder_end(void* d) { static_cast<Decoder*>(d)->end(); }

int w2l_decoder_nhyps(void* d_) {
  auto* d = static_cast<Decoder*>(d_);
  return (int)d->frames.back().size();
}

// fills tokens/words (caller allocates T ints each); returns length; score
// trio written to score_out[3] = {score, am, lm}
int w2l_decoder_result(void* d_, int hyp_idx, int32_t* tokens, int32_t* words,
                       int max_len, double* score_out) {
  auto* d = static_cast<Decoder*>(d_);
  const auto& fin = d->frames.back();
  if (hyp_idx >= (int)fin.size()) return -1;
  std::vector<int> tk, wd;
  d->backtrack(hyp_idx, tk, wd);
  int L = std::min((int)tk.size(), max_len);
  for (int i = 0; i < L; i++) {
    tokens[i] = tk[i];
    words[i] = wd[i];
  }
  score_out[0] = fin[hyp_idx].score;
  score_out[1] = fin[hyp_idx].am_score;
  score_out[2] = fin[hyp_idx].lm_score;
  return L;
}

// prune lattice keeping last (look_back+1) frames (online API)
void w2l_decoder_prune(void* d_, int look_back) {
  auto* d = static_cast<Decoder*>(d_);
  int keep_from = std::max(0, (int)d->frames.size() - 1 - look_back);
  if (keep_from == 0) return;
  // materialize best path prefix is the caller's job (get_best before prune);
  // we re-root: collapse frames[0..keep_from] into a single frame whose hyps
  // are frames[keep_from] with parent = -1.
  std::vector<std::vector<Hyp>> nf;
  nf.push_back(d->frames[keep_from]);
  for (auto& h : nf[0]) h.parent = -1;
  for (size_t t = keep_from + 1; t < d->frames.size(); t++)
    nf.push_back(std::move(d->frames[t]));
  d->frames = std::move(nf);
}

}  // extern "C"
