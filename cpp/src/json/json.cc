#include "json/json.h"

#include <cmath>
#include <cstdio>
#include <sstream>

namespace gabby::json {

namespace {
const char* TypeName(Type t) {
    switch (t) {
        case Type::NUM: return "number";
        case Type::BOOL: return "boolean";
        case Type::STR: return "string";
        case Type::ARRAY: return "array";
        case Type::OBJ: return "object";
        case Type::NIL: return "null";
    }
    return "?";
}

[[noreturn]] void ThrowType(Type want, Type got) {
    throw TypeError(std::string("expected ") + TypeName(want) + ", got " +
                    TypeName(got));
}
}  // namespace

ValuePtr Value::number(double v) { return std::make_shared<NumberValue>(v); }
ValuePtr Value::boolean(bool v) { return std::make_shared<BooleanValue>(v); }
ValuePtr Value::string(std::string v) {
    return std::make_shared<StringValue>(std::move(v));
}
ValuePtr Value::array(std::vector<ValuePtr> items) {
    return std::make_shared<ArrayValue>(std::move(items));
}
ValuePtr Value::object(std::map<std::string, ValuePtr> fields) {
    return std::make_shared<ObjectValue>(std::move(fields));
}
ValuePtr Value::nil() { return std::make_shared<NilValue>(); }

double Value::as_number() const {
    auto* p = dynamic_cast<const NumberValue*>(this);
    if (!p) ThrowType(Type::NUM, type());
    return p->value();
}

bool Value::as_boolean() const {
    auto* p = dynamic_cast<const BooleanValue*>(this);
    if (!p) ThrowType(Type::BOOL, type());
    return p->value();
}

const std::string& Value::as_string() const {
    auto* p = dynamic_cast<const StringValue*>(this);
    if (!p) ThrowType(Type::STR, type());
    return p->value();
}

const std::vector<ValuePtr>& Value::as_array() const {
    auto* p = dynamic_cast<const ArrayValue*>(this);
    if (!p) ThrowType(Type::ARRAY, type());
    return p->items();
}

const std::map<std::string, ValuePtr>& Value::as_object() const {
    auto* p = dynamic_cast<const ObjectValue*>(this);
    if (!p) ThrowType(Type::OBJ, type());
    return p->fields();
}

bool operator==(const Value& a, const Value& b) { return a.eq(b); }

std::ostream& operator<<(std::ostream& os, const Value& v) {
    v.print(os);
    return os;
}

std::string to_string(const Value& v) {
    std::ostringstream os;
    v.print(os);
    return os.str();
}

bool NumberValue::eq(const Value& o) const {
    auto* p = dynamic_cast<const NumberValue*>(&o);
    return p && p->value() == v_;
}

void NumberValue::print(std::ostream& os) const {
    // integers without a decimal point; everything else round-trippable
    if (std::isfinite(v_) && v_ == std::floor(v_) && std::abs(v_) < 1e15) {
        os << static_cast<long long>(v_);
    } else {
        char buf[32];
        std::snprintf(buf, sizeof(buf), "%.17g", v_);
        os << buf;
    }
}

bool StringValue::eq(const Value& o) const {
    auto* p = dynamic_cast<const StringValue*>(&o);
    return p && p->value() == v_;
}

void StringValue::print(std::ostream& os) const { EscapeString(os, v_); }

bool BooleanValue::eq(const Value& o) const {
    auto* p = dynamic_cast<const BooleanValue*>(&o);
    return p && p->value() == v_;
}

bool ArrayValue::eq(const Value& o) const {
    auto* p = dynamic_cast<const ArrayValue*>(&o);
    if (!p || p->items().size() != items_.size()) return false;
    for (size_t i = 0; i < items_.size(); i++) {
        if (!items_[i]->eq(*p->items()[i])) return false;
    }
    return true;
}

void ArrayValue::print(std::ostream& os) const {
    os << "[";
    for (size_t i = 0; i < items_.size(); i++) {
        if (i) os << ",";
        items_[i]->print(os);
    }
    os << "]";
}

bool ObjectValue::eq(const Value& o) const {
    auto* p = dynamic_cast<const ObjectValue*>(&o);
    if (!p || p->fields().size() != fields_.size()) return false;
    for (const auto& [k, v] : fields_) {
        auto it = p->fields().find(k);
        if (it == p->fields().end() || !v->eq(*it->second)) return false;
    }
    return true;
}

void ObjectValue::print(std::ostream& os) const {
    os << "{";
    bool first = true;
    for (const auto& [k, v] : fields_) {
        if (!first) os << ",";
        first = false;
        EscapeString(os, k);
        os << ":";
        v->print(os);
    }
    os << "}";
}

const ValuePtr& ObjectValue::at(const std::string& key) const {
    auto it = fields_.find(key);
    if (it == fields_.end()) throw KeyNotFoundError(key);
    return it->second;
}

ValuePtr ObjectValue::get(const std::string& key) const {
    auto it = fields_.find(key);
    return it == fields_.end() ? nullptr : it->second;
}

void EscapeString(std::ostream& os, const std::string& s) {
    os << '"';
    for (unsigned char c : s) {
        switch (c) {
            case '"': os << "\\\""; break;
            case '\\': os << "\\\\"; break;
            case '\n': os << "\\n"; break;
            case '\r': os << "\\r"; break;
            case '\t': os << "\\t"; break;
            case '\b': os << "\\b"; break;
            case '\f': os << "\\f"; break;
            default:
                if (c < 0x20) {
                    char buf[8];
                    std::snprintf(buf, sizeof(buf), "\\u%04x", c);
                    os << buf;
                } else {
                    os << static_cast<char>(c);
                }
        }
    }
    os << '"';
}

}  // namespace gabby::json
