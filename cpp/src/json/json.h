// JSON value tree.
//
// Same capability as the reference's DOM (/root/reference/src/json/json.h:
// 16-290): a shared-ptr Value tree with factories, throwing typed accessors,
// deep structural equality, and printing. Two deliberate upgrades: printing
// escapes control characters / quotes / backslashes (the reference prints
// strings raw), and numbers render without trailing ".000000" noise.
#ifndef GABBY_JSON_JSON_H_
#define GABBY_JSON_JSON_H_

#include <map>
#include <memory>
#include <ostream>
#include <stdexcept>
#include <string>
#include <vector>

namespace gabby::json {

class JSONError : public std::runtime_error {
   public:
    explicit JSONError(const std::string& msg) : std::runtime_error(msg) {}
};

class TypeError : public JSONError {
   public:
    explicit TypeError(const std::string& msg) : JSONError(msg) {}
};

class ParsingError : public JSONError {
   public:
    explicit ParsingError(const std::string& msg) : JSONError(msg) {}
};

class KeyNotFoundError : public JSONError {
   public:
    explicit KeyNotFoundError(const std::string& key)
        : JSONError("key not found: " + key) {}
};

enum class Type { NUM, BOOL, STR, ARRAY, OBJ, NIL };

class Value;
using ValuePtr = std::shared_ptr<Value>;

class Value {
   public:
    virtual ~Value() = default;
    virtual Type type() const = 0;
    virtual bool eq(const Value& other) const = 0;
    virtual void print(std::ostream& os) const = 0;

    // Factories.
    static ValuePtr number(double v);
    static ValuePtr boolean(bool v);
    static ValuePtr string(std::string v);
    static ValuePtr array(std::vector<ValuePtr> items = {});
    static ValuePtr object(std::map<std::string, ValuePtr> fields = {});
    static ValuePtr nil();

    // Throwing typed accessors.
    double as_number() const;
    bool as_boolean() const;
    const std::string& as_string() const;
    const std::vector<ValuePtr>& as_array() const;
    const std::map<std::string, ValuePtr>& as_object() const;

    bool is(Type t) const { return type() == t; }
};

bool operator==(const Value& a, const Value& b);
std::ostream& operator<<(std::ostream& os, const Value& v);
std::string to_string(const Value& v);

class NumberValue : public Value {
   public:
    explicit NumberValue(double v) : v_(v) {}
    Type type() const override { return Type::NUM; }
    bool eq(const Value& o) const override;
    void print(std::ostream& os) const override;
    double value() const { return v_; }

   private:
    double v_;
};

class BooleanValue : public Value {
   public:
    explicit BooleanValue(bool v) : v_(v) {}
    Type type() const override { return Type::BOOL; }
    bool eq(const Value& o) const override;
    void print(std::ostream& os) const override {
        os << (v_ ? "true" : "false");
    }
    bool value() const { return v_; }

   private:
    bool v_;
};

class StringValue : public Value {
   public:
    explicit StringValue(std::string v) : v_(std::move(v)) {}
    Type type() const override { return Type::STR; }
    bool eq(const Value& o) const override;
    void print(std::ostream& os) const override;
    const std::string& value() const { return v_; }

   private:
    std::string v_;
};

class ArrayValue : public Value {
   public:
    explicit ArrayValue(std::vector<ValuePtr> items) : items_(std::move(items)) {}
    Type type() const override { return Type::ARRAY; }
    bool eq(const Value& o) const override;
    void print(std::ostream& os) const override;
    const std::vector<ValuePtr>& items() const { return items_; }
    std::vector<ValuePtr>& items() { return items_; }
    const ValuePtr& at(size_t i) const { return items_.at(i); }
    void push_back(ValuePtr v) { items_.push_back(std::move(v)); }
    size_t size() const { return items_.size(); }

   private:
    std::vector<ValuePtr> items_;
};

class ObjectValue : public Value {
   public:
    explicit ObjectValue(std::map<std::string, ValuePtr> fields)
        : fields_(std::move(fields)) {}
    Type type() const override { return Type::OBJ; }
    bool eq(const Value& o) const override;
    void print(std::ostream& os) const override;
    const std::map<std::string, ValuePtr>& fields() const { return fields_; }
    const ValuePtr& at(const std::string& key) const;
    bool contains(const std::string& key) const { return fields_.count(key) > 0; }
    ValuePtr get(const std::string& key) const;  // nullptr if absent
    void set(const std::string& key, ValuePtr v) { fields_[key] = std::move(v); }

   private:
    std::map<std::string, ValuePtr> fields_;
};

class NilValue : public Value {
   public:
    Type type() const override { return Type::NIL; }
    bool eq(const Value& o) const override { return o.type() == Type::NIL; }
    void print(std::ostream& os) const override { os << "null"; }
};

// Writes s as a JSON string literal (quotes + escapes) to os.
void EscapeString(std::ostream& os, const std::string& s);

}  // namespace gabby::json

#endif  // GABBY_JSON_JSON_H_
