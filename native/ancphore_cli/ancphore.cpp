// ancphore: pharmacophore fitness scorer, AncPhore CLI contract.
//
// Native host-side twin of diffphore_tpu/ops/fitscore.py.  The reference
// pipeline shells out to the (unshipped) AncPhore binary per complex:
//   ./AncPhore -d poses.sdf --refphore x.phore --scores out \
//       usedMultiConformerFile formodel [--exvolume_cutoff N] \
//       [--overlap_coeff X] [--percent_coeff X] [--anchor_coeff X]
// (reference process_pharmacophore.py:986).  This program preserves that
// command line and the score-file column-index contract
// (parse_score_file, :885-918): tab-separated rows whose final six columns
// are [custom fitness, fishing score, PhScore1, PhScore2, PhScore3,
// PhScore4].
//
// Scoring math (verified against the committed example score files):
//   self_volume(f) = w * 8 * (pi / (2 a))^1.5
//   V_ref  = sum self_volume over reference features
//   pair_volume    = sqrt(w1 w2) * 8 (pi/(a1+a2))^1.5 exp(-a1 a2 r^2/(a1+a2))
//   PhScore_k = w_o (V_ov/V_ref - V_ex/cutoff) + w_p match% + w_a anchor%
//
// Pharmacophore perception mirrors diffphore_tpu/chem/pharmacophore_rules.py
// (rule equivalents of the reference's SMARTS table).
//
// Build: g++ -O2 -std=c++17 -o ancphore ancphore.cpp

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <array>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

static const double PI = 3.14159265358979323846;
static const double K_ALPHA = 2.41798725037;

// Absolute-scale calibration of PhScore1 (mirrors ops/fitscore.py
// PHSCORE1_CAL_KNOTS): piecewise-linear isotonic fit from the raw
// volume-overlap score to AncPhore's PhScore1 over the 600 committed
// golden poses (analysis/calibrate_fitscore.py).  +1e-3*raw keeps the map
// strictly increasing, so rankings equal the raw rankings exactly.
static const double CAL_X[] = {
    -0.113051, 0.132975, 0.181158, 0.216646, 0.245116, 0.270835, 0.291010,
    0.309699, 0.330984, 0.347223, 0.370010, 0.397535, 0.425741, 0.462761,
    0.512456, 0.671428};
static const double CAL_Y[] = {
    -0.676896, 0.090175, 0.140867, 0.161575, 0.188217, 0.192337, 0.203436,
    0.207176, 0.207176, 0.262673, 0.269165, 0.289286, 0.306142, 0.306142,
    0.371636, 0.511553};
static double calibrate_phscore1(double raw) {
  const int n = sizeof(CAL_X) / sizeof(CAL_X[0]);
  double y;
  if (raw <= CAL_X[0]) y = CAL_Y[0];
  else if (raw >= CAL_X[n - 1]) {
    // slope-extrapolate the last isotonic segment past the golden support
    // (mirrors ops/fitscore.py calibrate_phscore1; a clamp here collapsed
    // high-raw poses onto one value, degenerating percentile metrics)
    double s = (CAL_Y[n - 1] - CAL_Y[n - 2]) / (CAL_X[n - 1] - CAL_X[n - 2]);
    y = CAL_Y[n - 1] + (raw - CAL_X[n - 1]) * s;
  } else {
    int i = 1;
    while (raw > CAL_X[i]) ++i;
    double t = (raw - CAL_X[i - 1]) / (CAL_X[i] - CAL_X[i - 1]);
    y = CAL_Y[i - 1] + t * (CAL_Y[i] - CAL_Y[i - 1]);
  }
  return y + 1e-3 * raw;
}

enum PType { MB = 0, HD, AR, PO, HA, HY, NE, CV, CR, XB, EX, NUM_TYPES };
static const char* TYPE_NAMES[] = {"MB", "HD", "AR", "PO", "HA",
                                   "HY", "NE", "CV", "CR", "XB", "EX"};
static const double TYPE_WEIGHT[] = {1.5, 1.2, 1.0, 1.5, 1.2, 0.5,
                                     1.5, 1.0, 1.0, 1.0, 1.0};
static const double TYPE_ALPHA[] = {1.0, 1.0, 0.7, 1.0, 1.0, 0.7,
                                    1.0, 1.0, 0.7, 1.0, 0.837};

struct Vec3 {
  double x = 0, y = 0, z = 0;
};
static double dist2(const Vec3& a, const Vec3& b) {
  double dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

struct Atom {
  int z = 6;
  int charge = 0;
  bool aromatic = false;
  Vec3 pos;
};

struct Mol {
  std::string name;
  std::vector<Atom> atoms;
  std::vector<std::array<int, 3>> bonds;  // i, j, order (4 = aromatic)
  std::vector<std::vector<int>> nbrs;
  std::vector<std::vector<int>> rings;  // SSSR-ish cycles

  void finalize();
  int order(int i, int j) const {
    for (auto& b : bonds)
      if ((b[0] == i && b[1] == j) || (b[0] == j && b[1] == i)) return b[2];
    return 0;
  }
};

struct PhorePoint {
  int type = EX;
  double alpha = 1, weight = 1, anchor = 1;
  Vec3 pos;
  bool has_norm = false;
};

// ---------------------------------------------------------------- elements
static int symbol_to_z(const std::string& s) {
  static const std::map<std::string, int> tbl = {
      {"H", 1},  {"B", 5},   {"C", 6},  {"N", 7},  {"O", 8},  {"F", 9},
      {"Si", 14}, {"P", 15}, {"S", 16}, {"Cl", 17}, {"Se", 34}, {"Br", 35},
      {"I", 53}};
  auto it = tbl.find(s);
  return it == tbl.end() ? 6 : it->second;
}

static double vdw_radius(int z) {
  switch (z) {
    case 1: return 1.2;
    case 6: return 1.7;
    case 7: return 1.55;
    case 8: return 1.52;
    case 9: return 1.47;
    case 15: return 1.8;
    case 16: return 1.8;
    case 17: return 1.75;
    case 34: return 1.9;
    case 35: return 1.85;
    case 53: return 1.98;
    default: return 1.7;
  }
}

// ------------------------------------------------------------ ring finding
// Minimal-cycle detection: for each chord edge of a BFS spanning tree,
// take the shortest cycle through it (good enough for drug-like rings).
void Mol::finalize() {
  int n = atoms.size();
  nbrs.assign(n, {});
  for (auto& b : bonds) {
    nbrs[b[0]].push_back(b[1]);
    nbrs[b[1]].push_back(b[0]);
  }
  // shortest cycle through each bond via BFS excluding the bond
  std::set<std::vector<int>> uniq;
  for (auto& b : bonds) {
    int src = b[0], dst = b[1];
    std::vector<int> prev(n, -1), dist(n, -1);
    std::vector<int> queue = {src};
    dist[src] = 0;
    for (size_t qi = 0; qi < queue.size(); ++qi) {
      int u = queue[qi];
      for (int v : nbrs[u]) {
        if (u == src && v == dst) continue;
        if (dist[v] < 0) {
          dist[v] = dist[u] + 1;
          prev[v] = u;
          queue.push_back(v);
        }
      }
    }
    if (dist[dst] > 0 && dist[dst] <= 7) {
      std::vector<int> ring;
      for (int v = dst; v != -1; v = prev[v]) ring.push_back(v);
      std::vector<int> key = ring;
      std::sort(key.begin(), key.end());
      if (uniq.insert(key).second) rings.push_back(ring);
    }
  }
}

static bool in_same_ring(const Mol& m, int i, int j) {
  for (auto& r : m.rings) {
    bool fi = false, fj = false;
    for (int a : r) {
      fi |= (a == i);
      fj |= (a == j);
    }
    if (fi && fj) return true;
  }
  return false;
}

// --------------------------------------------------------- aromaticity
static void perceive_aromaticity(Mol& m) {
  for (auto& ring : m.rings) {
    if (ring.size() < 5 || ring.size() > 7) continue;
    int pi = 0;
    bool ok = true;
    std::set<int> rs(ring.begin(), ring.end());
    for (int i : ring) {
      const Atom& a = m.atoms[i];
      int dbl_in = 0, dbl_out = 0;
      for (int j : m.nbrs[i]) {
        int o = m.order(i, j);
        if (o == 2 || o == 4) (rs.count(j) ? dbl_in : dbl_out)++;
      }
      if (dbl_in >= 1)
        pi += 1;
      else if (dbl_out)
        pi += 0;
      else if (a.z == 7 || a.z == 8 || a.z == 16 || a.z == 34 || a.z == 15)
        pi += 2;
      else {
        ok = false;
        break;
      }
    }
    if (ok && pi % 4 == 2)
      for (int i : ring) m.atoms[i].aromatic = true;
  }
}

// ------------------------------------------------ pharmacophore perception
// Mirrors chem/pharmacophore_rules.py.  Pose SDFs from the pipeline are
// H-free, so hydrogens are counted as explicit-H neighbors plus the
// valence-rule implicit count (same model as chem/mol.py).
static int explicit_h(const Mol& m, int i) {
  int c = 0;
  for (int j : m.nbrs[i])
    if (m.atoms[j].z == 1) c++;
  return c;
}

static int total_h(const Mol& m, int i, bool mol_has_explicit_h) {
  if (mol_has_explicit_h) return explicit_h(m, i);
  const Atom& a = m.atoms[i];
  std::vector<int> valences;
  switch (a.z) {
    case 5: valences = {3 - a.charge}; break;
    case 6: valences = {4 - std::abs(a.charge)}; break;
    case 7: valences = {3 + a.charge}; break;
    case 8: valences = {2 + a.charge}; break;
    case 9: case 17: case 35: case 53: valences = {1}; break;
    case 15: valences = {3, 5}; break;
    case 16: valences = {2, 4, 6}; break;
    default: return 0;
  }
  double order = 0;
  for (int j : m.nbrs[i]) {
    int o = m.order(i, j);
    order += (o == 4) ? 1.5 : o;
  }
  int io = (int)std::ceil(order - 1e-9);
  for (int v : valences)
    if (io <= v) return v - io;
  return 0;
}

static std::vector<std::array<double, NUM_TYPES>> perceive(const Mol& m) {
  int n = m.atoms.size();
  std::vector<std::array<double, NUM_TYPES>> fp(n);
  for (auto& row : fp) row.fill(0.0);
  bool has_h = false;
  for (auto& at : m.atoms) has_h |= (at.z == 1);
  for (int i = 0; i < n; ++i) {
    const Atom& a = m.atoms[i];
    if (a.z == 1) continue;
    int nh = total_h(m, i, has_h);
    std::vector<int> heavy;
    for (int j : m.nbrs[i])
      if (m.atoms[j].z != 1) heavy.push_back(j);
    std::vector<int> doubles;
    for (int j : heavy)
      if (m.order(i, j) == 2) doubles.push_back(j);

    // HD; aromatic N also counts as a donor in the scoring perception
    // (calibrated against the committed AncPhore golden score files - see
    // diffphore_tpu/chem/pharmacophore_rules.py::scoring_phore_fp)
    if ((a.z == 7 || a.z == 8 || a.z == 16) && a.charge >= 0 && a.charge <= 2 &&
        nh >= 1)
      fp[i][HD] = 1;
    if (a.z == 7 && a.aromatic) fp[i][HD] = 1;

    // HA: [O,S;H1;v2]-[!$(*=[O,N,P,S])] | [O,S;H0;v2] | [O,S;-] | amine N |
    // aromatic n/o/s (reference SMARTS, process_mols.py:80)
    bool ha = false;
    if ((a.z == 8 || a.z == 16) && !a.aromatic) {
      int valence = nh;
      for (int j : heavy) valence += m.order(i, j) == 4 ? 1 : m.order(i, j);
      if (a.charge < 0)
        ha = true;
      else if (valence == 2) {
        if (nh == 1) {
          bool acid = false;
          for (int j : heavy)
            for (int k : m.nbrs[j])
              if (k != i && m.order(j, k) == 2 &&
                  (m.atoms[k].z == 7 || m.atoms[k].z == 8 ||
                   m.atoms[k].z == 15 || m.atoms[k].z == 16))
                acid = true;
          if (!acid) ha = true;
        } else if (nh == 0)
          // includes carbonyl / sulfonyl / phosphoryl O (one double bond)
          ha = true;
      }
    }
    if (a.z == 7 && !a.aromatic && a.charge == 0) {
      bool amide = false;
      for (int j : heavy)
        for (int k : m.nbrs[j])
          if (k != i && m.order(j, k) == 2 && !in_same_ring(m, j, k) &&
              (m.atoms[k].z == 7 || m.atoms[k].z == 8 || m.atoms[k].z == 15 ||
               m.atoms[k].z == 16))
            amide = true;
      if (!amide && doubles.empty()) ha = true;
    }
    if (a.aromatic && a.charge == 0 &&
        ((a.z == 7 && nh == 0) || a.z == 8 || a.z == 16))
      ha = true;
    if (ha) fp[i][HA] = 1;

    // MB
    bool mb = false;
    if (a.z == 8 && a.charge <= 0) {
      if (doubles.empty())
        mb = true;
      else {
        int j = doubles[0], zj = m.atoms[j].z;
        if (zj == 7 || zj == 15 || zj == 16)
          mb = true;
        else if (zj == 6) {
          if (total_h(m, j, has_h) >= 1) mb = true;
          for (int k : m.nbrs[j])
            if (k != i && m.atoms[k].z != 1 &&
                (m.atoms[k].z == 7 || m.atoms[k].z == 8 || m.atoms[k].z == 16))
              mb = true;
        }
      }
    }
    if (a.z == 8 && a.aromatic) mb = true;
    if (a.z == 16) {
      if (a.aromatic)
        mb = true;
      else if (doubles.empty() && heavy.size() == 2 && nh == 0)
        mb = true;
      else
        for (int j : heavy)
          if (m.atoms[j].z == 6 && m.order(i, j) == 2) mb = true;
    }
    if (a.z == 7 && a.charge <= 0) {
      if (a.aromatic) {
        if (nh >= 1 || (int)heavy.size() + nh <= 2) mb = true;
      } else
        mb = true;
    }
    if (a.z == 34 && nh >= 1) mb = true;
    if (ha) mb = true;
    if (mb) fp[i][MB] = 1;

    // PO
    bool nitro_n = false;
    if (a.z == 7)
      for (int j : heavy)
        if (m.atoms[j].z == 8 && m.atoms[j].charge < 0) nitro_n = true;
    if (a.charge > 0 && !nitro_n) fp[i][PO] = 1;
    if (a.z == 6 && !a.aromatic) {
      int single_n = 0, double_n = 0;
      for (int j : heavy)
        if (m.atoms[j].z == 7)
          (m.order(i, j) == 1 ? single_n : double_n)++;
      if (single_n >= 1 && double_n == 1) fp[i][PO] = 1;
    }

    // NE: acid-group oxygens/sulfurs
    for (int j : heavy) {
      const Atom& aj = m.atoms[j];
      if (aj.z != 6 && aj.z != 15 && aj.z != 16) continue;
      bool has_dbl = false, has_oh = false;
      for (int k : m.nbrs[j]) {
        if (m.order(j, k) == 2 && (m.atoms[k].z == 8 || m.atoms[k].z == 16))
          has_dbl = true;
        if (m.order(j, k) == 1 && m.atoms[k].z == 8 &&
            (m.atoms[k].charge < 0 || total_h(m, k, has_h) >= 1))
          has_oh = true;
      }
      if (has_dbl && has_oh) {
        if (m.order(i, j) == 2 && (a.z == 8 || a.z == 16)) fp[i][NE] = 1;
        if (m.order(i, j) == 1 && a.z == 8 &&
            (a.charge < 0 || nh >= 1))
          fp[i][NE] = 1;
      }
    }

    // AR / CR
    if (a.aromatic) fp[i][AR] = 1;

    // XB
    if ((a.z == 17 || a.z == 35 || a.z == 53) && heavy.size() == 1 &&
        m.atoms[heavy[0]].z == 6)
      fp[i][XB] = 1;

    // HY
    bool hy = false;
    if (a.z == 6) {
      if (a.aromatic)
        hy = true;
      else if (a.charge == 0) {
        bool polar = false;
        for (int j : heavy)
          if (m.atoms[j].z == 7 || m.atoms[j].z == 8 || m.atoms[j].z == 9)
            polar = true;
        if (!polar) hy = true;
      }
    } else if (a.z == 16) {
      if (a.aromatic || (nh == 0 && heavy.size() == 2 && doubles.empty()))
        hy = true;
    } else if (a.z == 35 || a.z == 53)
      hy = true;
    if (hy) fp[i][HY] = 1;

    // CV (major warhead families)
    bool cv = false;
    if (a.z == 6) {
      for (int j : heavy)
        if (m.order(i, j) == 3 && m.atoms[j].z == 7) cv = true;  // nitrile
      if (nh >= 1 && !doubles.empty())
        for (int j : doubles)
          if (m.atoms[j].z == 8) cv = true;  // aldehyde
      if (!a.aromatic && doubles.empty())
        for (int j : heavy) {
          int zj = m.atoms[j].z;
          if (zj == 9 || zj == 17 || zj == 35 || zj == 53) cv = true;  // halo
        }
    } else if (a.z == 16) {
      if (nh >= 1) cv = true;  // thiol
      for (int j : heavy)
        if (m.atoms[j].z == 16) cv = true;  // disulfide
    } else if (a.z == 34 && nh >= 1)
      cv = true;
    if (cv) fp[i][CV] = 1;
  }
  for (int i = 0; i < n; ++i)
    fp[i][CR] = std::max(fp[i][AR], fp[i][PO]);
  return fp;
}

// ------------------------------------------------------------------ SDF IO
static std::vector<Mol> read_sdf(const std::string& path) {
  std::ifstream f(path);
  std::vector<Mol> mols;
  std::string line;
  std::vector<std::string> rec;
  auto flush = [&]() {
    if (rec.size() < 4) {
      rec.clear();
      return;
    }
    Mol m;
    m.name = rec[0];
    const std::string& counts = rec[3];
    if (counts.find("V2000") == std::string::npos) {
      rec.clear();
      return;
    }
    int na = std::stoi(counts.substr(0, 3));
    int nb = std::stoi(counts.substr(3, 3));
    for (int i = 0; i < na; ++i) {
      const std::string& ln = rec[4 + i];
      Atom a;
      a.pos = {std::stod(ln.substr(0, 10)), std::stod(ln.substr(10, 10)),
               std::stod(ln.substr(20, 10))};
      std::string sym = ln.substr(31, 3);
      sym.erase(sym.find_last_not_of(' ') + 1);
      sym.erase(0, sym.find_first_not_of(' '));
      a.z = symbol_to_z(sym);
      m.atoms.push_back(a);
    }
    for (int b = 0; b < nb; ++b) {
      const std::string& ln = rec[4 + na + b];
      int i = std::stoi(ln.substr(0, 3)) - 1;
      int j = std::stoi(ln.substr(3, 3)) - 1;
      int o = std::stoi(ln.substr(6, 3));
      m.bonds.push_back({i, j, o});
    }
    for (size_t k = 4 + na + nb; k < rec.size(); ++k) {
      if (rec[k].rfind("M  CHG", 0) == 0) {
        std::istringstream ss(rec[k].substr(6));
        int cnt;
        ss >> cnt;
        for (int c = 0; c < cnt; ++c) {
          int idx, chg;
          ss >> idx >> chg;
          m.atoms[idx - 1].charge = chg;
        }
      }
    }
    m.finalize();
    perceive_aromaticity(m);
    mols.push_back(std::move(m));
    rec.clear();
  };
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.rfind("$$$$", 0) == 0)
      flush();
    else
      rec.push_back(line);
  }
  flush();
  return mols;
}

// ---------------------------------------------------------------- phore IO
static std::pair<std::string, std::vector<PhorePoint>> read_phore(
    const std::string& path) {
  std::ifstream f(path);
  std::string line, id;
  std::vector<PhorePoint> pts;
  bool have_id = false;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    if (!have_id) {
      id = line;
      have_id = true;
      continue;
    }
    if (line.rfind("$$$$", 0) == 0) break;  // single-model scoring
    std::vector<std::string> tok;
    std::istringstream ss(line);
    std::string t;
    while (std::getline(ss, t, '\t')) tok.push_back(t);
    if (tok.size() != 13) continue;
    PhorePoint p;
    std::string ty = tok[0].substr(0, 2);
    p.type = EX;
    for (int k = 0; k < NUM_TYPES; ++k)
      if (ty == TYPE_NAMES[k]) p.type = k;
    p.alpha = std::stod(tok[1]);
    p.weight = std::stod(tok[2]);
    p.pos = {std::stod(tok[4]), std::stod(tok[5]), std::stod(tok[6])};
    p.has_norm = tok[7] == "1";
    p.anchor = std::stod(tok[12]);
    pts.push_back(p);
  }
  return {id, pts};
}

// ----------------------------------------------------------------- scoring
static double self_volume(double w, double a) {
  return w * 8.0 * std::pow(PI / (2.0 * a), 1.5);
}
static double pair_volume(double w1, double w2, double a1, double a2,
                          double r2) {
  return std::sqrt(w1 * w2) * 8.0 * std::pow(PI / (a1 + a2), 1.5) *
         std::exp(-a1 * a2 * r2 / (a1 + a2));
}

int main(int argc, char** argv) {
  std::string db_file, ref_file, score_file;
  double ex_cutoff = 500.0, w_o = -1, w_p = -1, w_a = -1;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(i + 1 < argc ? argv[++i] : ""); };
    if (a == "-d")
      db_file = next();
    else if (a == "--refphore")
      ref_file = next();
    else if (a == "--scores")
      score_file = next();
    else if (a == "--exvolume_cutoff")
      ex_cutoff = std::stod(next());
    else if (a == "--overlap_coeff")
      w_o = std::stod(next());
    else if (a == "--percent_coeff")
      w_p = std::stod(next());
    else if (a == "--anchor_coeff")
      w_a = std::stod(next());
    // positional flags (usedMultiConformerFile / formodel) accepted silently
  }
  if (db_file.empty() || ref_file.empty() || score_file.empty()) {
    std::cerr << "usage: ancphore -d poses.sdf --refphore x.phore --scores "
                 "out [usedMultiConformerFile formodel] [--exvolume_cutoff N] "
                 "[--overlap_coeff X --percent_coeff X --anchor_coeff X]\n";
    return 2;
  }
  auto mols = read_sdf(db_file);
  auto [ref_id, pts] = read_phore(ref_file);
  if (mols.empty() || pts.empty()) {
    std::cerr << "[E] empty database or reference pharmacophore\n";
    return 1;
  }

  std::vector<PhorePoint> feats, exs;
  for (auto& p : pts) (p.type == EX ? exs : feats).push_back(p);
  double V_ref = 0, V_anchor = 0;
  for (auto& p : feats) {
    V_ref += self_volume(p.weight, p.alpha);
    V_anchor += self_volume(p.weight, p.alpha) * p.anchor;
  }

  std::ofstream out(score_file);
  for (auto& m : mols) {
    auto fp = perceive(m);
    double V_db = 0;
    int n_db = 0;
    for (size_t i = 0; i < m.atoms.size(); ++i)
      for (int t = 0; t < EX; ++t)
        if (fp[i][t] > 0) {
          V_db += self_volume(TYPE_WEIGHT[t], TYPE_ALPHA[t]);
          ++n_db;
        }

    double V_ov = 0, V_ex = 0, anchor_ov = 0;
    int matched = 0;
    for (auto& p : feats) {
      // best-match combination: each reference feature is served by its
      // single best same-type ligand feature (AncPhore's 1:1 mapping;
      // bounds V_overlap by V_ref - see ops/fitscore.py measurements)
      double best = 1e18, ov_i = 0;
      for (size_t i = 0; i < m.atoms.size(); ++i) {
        if (m.atoms[i].z == 1 || fp[i][p.type] == 0) continue;
        double r2 = dist2(m.atoms[i].pos, p.pos);
        ov_i = std::max(ov_i, pair_volume(p.weight, TYPE_WEIGHT[p.type],
                                          p.alpha, TYPE_ALPHA[p.type], r2));
        best = std::min(best, std::sqrt(r2));
      }
      V_ov += ov_i;
      anchor_ov += ov_i * p.anchor;
      if (best < std::sqrt(K_ALPHA / p.alpha)) matched++;
    }
    for (auto& p : exs)
      for (size_t i = 0; i < m.atoms.size(); ++i) {
        if (m.atoms[i].z == 1) continue;
        double aa = K_ALPHA / std::pow(vdw_radius(m.atoms[i].z), 2);
        V_ex += pair_volume(p.weight, 1.0, p.alpha, aa,
                            dist2(m.atoms[i].pos, p.pos));
      }

    double ov_pct = V_ov / std::max(V_ref, 1e-9);
    double ex_pct = V_ex / ex_cutoff;
    double match_pct = feats.empty() ? 0 : double(matched) / feats.size();
    double anchor_pct = anchor_ov / std::max(V_anchor, 1e-9);
    auto ph = [&](double o, double p, double an) {
      return o * (ov_pct - ex_pct) + p * match_pct + an * anchor_pct;
    };
    double custom = (w_o >= 0) ? ph(w_o, std::max(w_p, 0.0), std::max(w_a, 0.0))
                               : ph(1, 0, 0);
    // target-fishing score (fitness index 5): PhScore1 * Tanimoto over
    // feature counts, n / (N_db + N_ref - n) - decoded exactly from the
    // reference's committed score files (column -5)
    double denom_tf = std::max<double>(n_db + (int)feats.size() - matched, 1.0);
    // PhScore1 (and the fishing score that decodes from it) carry the
    // golden-set absolute-scale calibration, matching ops/fitscore.py
    double phscore1 = calibrate_phscore1(ph(1, 0, 0));
    double fishing = phscore1 * matched / denom_tf;
    // column-index contract: [-6..-1] = custom, fishing, PhScore1..PhScore4
    out << m.name << "\t0.0\t" << ref_id << "\t" << feats.size() << "\t"
        << matched << "\t" << V_db << "\t" << V_ref << "\t" << V_ov << "\t"
        << match_pct << "\t" << V_ex << "\t" << anchor_pct << "\t" << ov_pct
        << "\t" << ex_pct << "\t" << custom << "\t" << fishing << "\t"
        << phscore1 << "\t" << ph(0.5, 0.5, 0) << "\t" << ph(0.5, 0, 0.5)
        << "\t" << ph(1.0 / 3, 1.0 / 3, 1.0 / 3) << "\n";
  }
  return 0;
}
