// Fast PLY point-cloud I/O — native runtime component.
//
// The reference's native I/O layer is PCL's PLY loader invoked from the CLI
// (pcl/alignment/src/alignment.cpp:212,241) plus the vendored MATLAB
// ply_read/ply_write. This is the rebuild's native equivalent: a
// single-pass, mmap-friendly parser for the subset the pipeline needs
// (vertex x/y/z [+ nx/ny/nz], ascii or binary_little_endian, float32/64
// properties, list-property faces skipped on read), exposed through a plain
// C ABI so Python binds via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libobjective_slam_native.so)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Property {
    std::string name;
    int size;          // bytes; -1 for list
    bool is_float;
    bool is_double;
    int list_count_size;  // for list props
    int list_elem_size;
};

struct Element {
    std::string name;
    long count;
    std::vector<Property> props;
};

int type_size(const std::string& t) {
    if (t == "char" || t == "int8" || t == "uchar" || t == "uint8") return 1;
    if (t == "short" || t == "int16" || t == "ushort" || t == "uint16")
        return 2;
    if (t == "int" || t == "int32" || t == "uint" || t == "uint32" ||
        t == "float" || t == "float32") return 4;
    if (t == "double" || t == "float64") return 8;
    return 0;
}

double read_binary_value(const unsigned char* p, const std::string& t) {
    if (t == "float" || t == "float32") {
        float v; std::memcpy(&v, p, 4); return v;
    }
    if (t == "double" || t == "float64") {
        double v; std::memcpy(&v, p, 8); return v;
    }
    if (t == "uchar" || t == "uint8") return *p;
    if (t == "char" || t == "int8") return *(const signed char*)p;
    if (t == "short" || t == "int16") {
        int16_t v; std::memcpy(&v, p, 2); return v;
    }
    if (t == "ushort" || t == "uint16") {
        uint16_t v; std::memcpy(&v, p, 2); return v;
    }
    if (t == "int" || t == "int32") {
        int32_t v; std::memcpy(&v, p, 4); return v;
    }
    if (t == "uint" || t == "uint32") {
        uint32_t v; std::memcpy(&v, p, 4); return v;
    }
    return 0.0;
}

}  // namespace

extern "C" {

// Reads a PLY file. On success returns 0 and fills:
//   *points  -> malloc'd n*3 floats (x,y,z interleaved)
//   *normals -> malloc'd n*3 floats or nullptr if absent
//   *n       -> vertex count
// Caller frees with osn_free(). Returns nonzero error code otherwise.
int osn_ply_read(const char* path, float** points, float** normals,
                 long* n_out) {
    *points = nullptr;
    *normals = nullptr;
    *n_out = 0;

    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<unsigned char> buf(fsize);
    if (std::fread(buf.data(), 1, fsize, f) != (size_t)fsize) {
        std::fclose(f);
        return 2;
    }
    std::fclose(f);

    // --- header ---
    const char* data = (const char*)buf.data();
    const char* end_hdr = (const char*)memmem(data, fsize, "end_header", 10);
    if (!end_hdr) return 3;
    const char* body = (const char*)memchr(end_hdr, '\n', 64);
    if (!body) return 3;
    body++;

    std::string header(data, end_hdr - data);
    bool binary = false, big_endian = false;
    std::vector<Element> elements;
    std::vector<std::string> prop_types;  // parallel to last element props
    size_t pos = 0;
    while (pos < header.size()) {
        size_t eol = header.find('\n', pos);
        if (eol == std::string::npos) eol = header.size();
        std::string line = header.substr(pos, eol - pos);
        pos = eol + 1;
        char a[64] = {0}, b[64] = {0}, c[64] = {0}, d[64] = {0}, e[64] = {0};
        int nf = std::sscanf(line.c_str(), "%63s %63s %63s %63s %63s",
                             a, b, c, d, e);
        if (nf < 1) continue;
        if (!std::strcmp(a, "format")) {
            binary = !std::strncmp(b, "binary", 6);
            big_endian = !std::strcmp(b, "binary_big_endian");
        } else if (!std::strcmp(a, "element") && nf >= 3) {
            elements.push_back({b, std::atol(c), {}});
        } else if (!std::strcmp(a, "property") && !elements.empty()) {
            Property p;
            if (!std::strcmp(b, "list")) {
                p.name = e;
                p.size = -1;
                p.list_count_size = type_size(c);
                p.list_elem_size = type_size(d);
                p.is_float = p.is_double = false;
                // remember types via name hack
                p.name = std::string(e) + "\x01" + c + "\x01" + d;
            } else {
                p.name = std::string(c) + "\x01" + b;
                p.size = type_size(b);
                p.is_float = !std::strcmp(b, "float") ||
                             !std::strcmp(b, "float32");
                p.is_double = !std::strcmp(b, "double") ||
                              !std::strcmp(b, "float64");
                p.list_count_size = p.list_elem_size = 0;
            }
            elements.back().props.push_back(p);
        }
    }
    if (big_endian) return 4;

    const Element* vertex = nullptr;
    for (const auto& el : elements)
        if (el.name == "vertex") { vertex = &el; break; }
    if (!vertex) return 5;

    long n = vertex->count;
    float* pts = (float*)std::malloc(sizeof(float) * 3 * n);
    float* nrm = (float*)std::malloc(sizeof(float) * 3 * n);
    bool has_normals = false;
    int xi = -1, yi = -1, zi = -1, nxi = -1, nyi = -1, nzi = -1;
    std::vector<std::string> names, types;
    for (size_t i = 0; i < vertex->props.size(); i++) {
        const std::string& tagged = vertex->props[i].name;
        size_t sep = tagged.find('\x01');
        std::string nm = tagged.substr(0, sep);
        std::string ty = sep == std::string::npos ? "" :
            tagged.substr(sep + 1);
        size_t sep2 = ty.find('\x01');
        if (sep2 != std::string::npos) ty = ty.substr(0, sep2);
        names.push_back(nm);
        types.push_back(ty);
        if (nm == "x") xi = i; else if (nm == "y") yi = i;
        else if (nm == "z") zi = i;
        else if (nm == "nx") nxi = i; else if (nm == "ny") nyi = i;
        else if (nm == "nz") nzi = i;
    }
    has_normals = nxi >= 0 && nyi >= 0 && nzi >= 0;
    if (xi < 0 || yi < 0 || zi < 0) {
        std::free(pts); std::free(nrm);
        return 6;
    }

    if (binary) {
        // Fast path: all-float contiguous x,y,z(,nx,ny,nz) layout.
        bool all4 = true;
        long stride = 0;
        std::vector<long> offsets(vertex->props.size());
        for (size_t i = 0; i < vertex->props.size(); i++) {
            if (vertex->props[i].size < 0) { all4 = false; break; }
            offsets[i] = stride;
            stride += vertex->props[i].size;
        }
        // Elements before "vertex" in binary files would need skipping; the
        // writer side and all common clouds put vertex first.
        if (elements[0].name != "vertex") { std::free(pts); std::free(nrm);
                                            return 7; }
        const unsigned char* vbase = (const unsigned char*)body;
        long avail = fsize - (body - data);
        if (!all4 || avail < stride * n) {
            std::free(pts); std::free(nrm);
            return 8;
        }
        bool plain = types[xi] == "float" && types[yi] == "float" &&
                     types[zi] == "float";
        if (plain && xi + 1 == yi && yi + 1 == zi &&
            (!has_normals || (types[nxi] == "float" && nxi + 1 == nyi &&
                              nyi + 1 == nzi))) {
            // memcpy-per-row (vectorizable) fast path
            for (long i = 0; i < n; i++) {
                std::memcpy(pts + 3 * i, vbase + i * stride + offsets[xi],
                            12);
                if (has_normals)
                    std::memcpy(nrm + 3 * i,
                                vbase + i * stride + offsets[nxi], 12);
            }
        } else {
            for (long i = 0; i < n; i++) {
                const unsigned char* row = vbase + i * stride;
                pts[3 * i + 0] = (float)read_binary_value(row + offsets[xi],
                                                          types[xi]);
                pts[3 * i + 1] = (float)read_binary_value(row + offsets[yi],
                                                          types[yi]);
                pts[3 * i + 2] = (float)read_binary_value(row + offsets[zi],
                                                          types[zi]);
                if (has_normals) {
                    nrm[3 * i + 0] = (float)read_binary_value(
                        row + offsets[nxi], types[nxi]);
                    nrm[3 * i + 1] = (float)read_binary_value(
                        row + offsets[nyi], types[nyi]);
                    nrm[3 * i + 2] = (float)read_binary_value(
                        row + offsets[nzi], types[nzi]);
                }
            }
        }
    } else {
        // ascii
        const char* p = body;
        const char* file_end = data + fsize;
        for (long i = 0; i < n; i++) {
            for (size_t j = 0; j < vertex->props.size(); j++) {
                while (p < file_end && std::isspace((unsigned char)*p)) p++;
                char* next = nullptr;
                double v = std::strtod(p, &next);
                if (next == p) { std::free(pts); std::free(nrm); return 9; }
                p = next;
                if ((int)j == xi) pts[3 * i + 0] = (float)v;
                else if ((int)j == yi) pts[3 * i + 1] = (float)v;
                else if ((int)j == zi) pts[3 * i + 2] = (float)v;
                else if ((int)j == nxi) nrm[3 * i + 0] = (float)v;
                else if ((int)j == nyi) nrm[3 * i + 1] = (float)v;
                else if ((int)j == nzi) nrm[3 * i + 2] = (float)v;
            }
        }
    }

    *points = pts;
    if (has_normals) {
        *normals = nrm;
    } else {
        std::free(nrm);
        *normals = nullptr;
    }
    *n_out = n;
    return 0;
}

// Writes a binary_little_endian PLY with x,y,z(,nx,ny,nz).
int osn_ply_write(const char* path, const float* points,
                  const float* normals, long n) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    std::fprintf(f, "ply\nformat binary_little_endian 1.0\n"
                    "element vertex %ld\n"
                    "property float x\nproperty float y\nproperty float z\n",
                 n);
    if (normals)
        std::fprintf(f, "property float nx\nproperty float ny\n"
                        "property float nz\n");
    std::fprintf(f, "end_header\n");
    if (normals) {
        std::vector<float> row(6);
        for (long i = 0; i < n; i++) {
            std::memcpy(row.data(), points + 3 * i, 12);
            std::memcpy(row.data() + 3, normals + 3 * i, 12);
            std::fwrite(row.data(), 4, 6, f);
        }
    } else {
        std::fwrite(points, 4, 3 * n, f);
    }
    std::fclose(f);
    return 0;
}

void osn_free(float* p) { std::free(p); }

}  // extern "C"
