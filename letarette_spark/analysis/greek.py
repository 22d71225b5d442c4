"""Snowball Greek stemmer — pure Python, bit-exact to the compiled
libstemmer 'greek' UTF-8 stemmer (snowball 2.2.0) the reference links
against (reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens).  Pinned by tests/test_greek_goldens.py against vectors
captured from the compiled library plus live random sweeps.

Implements the published Greek algorithm (Ntais' stemmer with
Saroukos' extensions, snowballstem.org/algorithms/greek/stemmer.html):
tolower + accent folding (note the published table maps ϊ and ΐ to η —
mirrored), a minimum length of 3, the exception rewrites of step 1,
the verb-suffix family steps S1-S10 (each: strip the suffix, then
re-attach a stem particle when the remaining word is on the step's
exception list), the noun steps 2a-2d, 3, 4, the 13 step-5 ending
groups, the generic ending removal of step 6 (gated on no earlier
step having fired — the test1 boolean), and the comparative strip of
step 7.

Among tables (entries, fail-links, result classes) are the EXACT
arrays recovered from the compiled library's data section
(tools/extract_among.py); control flow was reconstructed from the
disassembly (tools/annotate_asm.py) and verified by differential
probing to 0 divergences over 700k random words (tools/
probe_stemmer.py --lang greek --diff).

One documented divergence: the generated C for steps3's
`('ισα' atlimit <- 'ισ')` slices with the stale ket of the preceding
delete, so the compiled library returns an ERROR (sb_stemmer_stem ->
NULL) for any word reduced to exactly 'ισα' after its ισ-suffix was
stripped (e.g. 'ισαισα').  A tokenizer must never fail on arbitrary
text (same invariant as decode_jpeg), so this port completes the
obviously-intended rewrite and returns 'ισ' there instead; the case
is pinned in tests.
"""

from __future__ import annotations

from letarette_spark.analysis._among import find_among_b, make_amongs

_V = frozenset("αεηιουω")    # grouping v  (bitmap @0x62b38)
_V2 = frozenset("αεηιοω")    # grouping v2 (bitmap @0x62b34)

# Lowercase replacements for tolower results 1..24 (jump table of the
# compiled stem function; 'ς' -> 'σ' via result 18, ϊ/ΐ -> η via 7).
_LOWER = (None, "α", "β", "γ", "δ", "ε", "ζ", "η", "θ", "ι", "κ", "λ",
          "μ", "ν", "ξ", "ο", "π", "ρ", "σ", "τ", "υ", "φ", "χ", "ψ",
          "ω")

_STEP1_REPL = (None, "φα", "σκα", "ολο", "σο", "τατο", "κρε", "περ",
               "τερ", "φω", "καθεστ", "γεγον")

_A13_REPL = (None, "αγνωστ", "ατομ", "γνωστ", "εθν", "εκλεκτ", "σκεπτ",
             "τοπ", "αλεξανδρ", "βυζαντ", "θεατρ")
_A0 = make_amongs((  # @0x89120
    ('', -1, 25), ('ς', 0, 18), ('Ά', 0, 1), ('Έ', 0, 5), ('Ή', 0, 7), 
    ('Ί', 0, 9), ('ϊ', 0, 7), ('ϋ', 0, 20), ('Ό', 0, 15), ('ό', 0, 15), 
    ('ύ', 0, 20), ('Ύ', 0, 20), ('ώ', 0, 24), ('Ώ', 0, 24), ('ΐ', 0, 7), 
    ('Α', 0, 1), ('Β', 0, 2), ('Γ', 0, 3), ('Δ', 0, 4), ('Ε', 0, 5), 
    ('Ζ', 0, 6), ('Η', 0, 7), ('Θ', 0, 8), ('Ι', 0, 9), ('Κ', 0, 10), 
    ('Λ', 0, 11), ('Μ', 0, 12), ('Ν', 0, 13), ('Ξ', 0, 14), ('Ο', 0, 15), 
    ('Π', 0, 16), ('Ρ', 0, 17), ('Σ', 0, 18), ('Τ', 0, 19), ('Υ', 0, 20), 
    ('Φ', 0, 21), ('Χ', 0, 22), ('Ψ', 0, 23), ('Ω', 0, 24), ('Ϊ', 0, 9), 
    ('Ϋ', 0, 20), ('ά', 0, 1), ('έ', 0, 5), ('ή', 0, 7), ('ί', 0, 9), 
    ('ΰ', 0, 20), 
))
_A1 = make_amongs((  # @0x88c20
    ('καθεστωσ', -1, 10), ('φωσ', -1, 9), ('περασ', -1, 7), 
    ('τερασ', -1, 8), ('κρεασ', -1, 6), ('καθεστωτοσ', -1, 10), 
    ('φωτοσ', -1, 9), ('περατοσ', -1, 7), ('τερατοσ', -1, 8), 
    ('κρεατοσ', -1, 6), ('γεγονοτοσ', -1, 11), ('γεγονοσ', -1, 11), 
    ('φαγιου', -1, 1), ('σκαγιου', -1, 2), ('σογιου', -1, 4), 
    ('τατογιου', -1, 5), ('ολογιου', -1, 3), ('καθεστωτα', -1, 10), 
    ('φωτα', -1, 9), ('περατα', -1, 7), ('τερατα', -1, 8), 
    ('κρεατα', -1, 6), ('γεγονοτα', -1, 11), ('φαγια', -1, 1), 
    ('σκαγια', -1, 2), ('σογια', -1, 4), ('τατογια', -1, 5), 
    ('ολογια', -1, 3), ('περατη', -1, 7), ('καθεστωτων', -1, 10), 
    ('φωτων', -1, 9), ('περατων', -1, 7), ('τερατων', -1, 8), 
    ('κρεατων', -1, 6), ('γεγονοτων', -1, 11), ('φαγιων', -1, 1), 
    ('σκαγιων', -1, 2), ('σογιων', -1, 4), ('τατογιων', -1, 5), 
    ('ολογιων', -1, 3), 
))
_A2 = make_amongs((  # @0x88840
    ('π', -1, 2), ('ιμπ', 0, 2), ('ρ', -1, 2), ('πρ', 2, 2), ('μπρ', 3, 2), 
    ('αρρ', 2, 2), ('γλυκυρ', 2, 2), ('πολυρ', 2, 2), ('αμπαρ', 2, 2), 
    ('μαρ', 2, 2), ('γκρ', 2, 2), ('πιπερορ', 2, 2), ('βολβορ', 2, 2), 
    ('γλυκορ', 2, 2), ('λου', -1, 2), ('πα', -1, 1), ('ξαναπα', 15, 1), 
    ('επα', 15, 1), ('περιπα', 15, 1), ('αναμπα', 15, 1), ('εμπα', 15, 1), 
    ('β', -1, 2), ('δανε', -1, 1), ('βαθυρι', -1, 2), ('βαρκ', -1, 2), 
    ('μαρκ', -1, 2), ('λ', -1, 2), ('μ', -1, 2), ('κορν', -1, 2), 
    ('αθρο', -1, 1), ('συναθρο', 29, 1), 
))
_A3 = make_amongs((  # @0x88680
    ('ιζεσ', -1, 1), ('ιζεισ', -1, 1), ('ιζω', -1, 1), ('ιζα', -1, 1), 
    ('ιζατε', -1, 1), ('ιζετε', -1, 1), ('ιζε', -1, 1), ('ιζουμε', -1, 1), 
    ('ιζαμε', -1, 1), ('ιζουνε', -1, 1), ('ιζανε', -1, 1), ('ιζει', -1, 1), 
    ('ιζουν', -1, 1), ('ιζαν', -1, 1), 
))
_A4 = make_amongs((  # @0x88580
    ('σ', -1, 1), ('χ', -1, 1), ('υψ', -1, 1), ('ζω', -1, 1), 
    ('βι', -1, 1), ('λι', -1, 1), ('αλ', -1, 1), ('εν', -1, 1), 
))
_A5 = make_amongs((  # @0x884a0
    ('ωθηκεσ', -1, 1), ('ωθηκα', -1, 1), ('ωθηκατε', -1, 1), 
    ('ωθηκε', -1, 1), ('ωθηκαμε', -1, 1), ('ωθηκανε', -1, 1), 
    ('ωθηκαν', -1, 1), 
))
_A6 = make_amongs((  # @0x880a0
    ('π', -1, 2), ('λαρ', -1, 2), ('δημοκρατ', -1, 2), ('αφ', -1, 2), 
    ('γιγαντοαφ', 3, 2), ('ξαναπα', -1, 1), ('επα', -1, 1), 
    ('περιπα', -1, 1), ('αναμπα', -1, 1), ('εμπα', -1, 1), 
    ('χαρτοπα', -1, 1), ('εξαρχα', -1, 1), ('πε', -1, 1), ('επε', 12, 1), 
    ('μετεπε', 13, 1), ('εσε', -1, 1), ('γε', -1, 2), ('γκε', -1, 2), 
    ('κλε', -1, 1), ('εσωκλε', 18, 1), ('εκλε', 18, 1), ('απεκλε', 20, 1), 
    ('αποκλε', 18, 1), ('δανε', -1, 1), ('γκ', -1, 2), ('μ', -1, 2), 
    ('πουκαμ', 25, 2), ('κομ', 25, 2), ('αν', -1, 2), ('αθρο', -1, 1), 
    ('συναθρο', 29, 1), ('ολο', -1, 2), 
))
_A7 = make_amongs((  # @0x87fc0
    ('ισεσ', -1, 1), ('ισα', -1, 1), ('ισε', -1, 1), ('ισατε', -1, 1), 
    ('ισαμε', -1, 1), ('ισανε', -1, 1), ('ισαν', -1, 1), 
))
_A8 = make_amongs((  # @0x87d60
    ('ξαναπα', -1, 1), ('επα', -1, 1), ('περιπα', -1, 1), 
    ('αναμπα', -1, 1), ('εμπα', -1, 1), ('χαρτοπα', -1, 1), 
    ('εξαρχα', -1, 1), ('πε', -1, 1), ('επε', 7, 1), ('μετεπε', 8, 1), 
    ('εσε', -1, 1), ('κλε', -1, 1), ('εσωκλε', 11, 1), ('εκλε', 11, 1), 
    ('απεκλε', 13, 1), ('αποκλε', 11, 1), ('δανε', -1, 1), ('αθρο', -1, 1), 
    ('συναθρο', 17, 1), 
))
_A9 = make_amongs((  # @0x87c80
    ('ισεισ', -1, 1), ('ισω', -1, 1), ('ισετε', -1, 1), ('ισουμε', -1, 1), 
    ('ισουνε', -1, 1), ('ισει', -1, 1), ('ισουν', -1, 1), 
))
_A10 = make_amongs((  # @0x87780
    ('π', -1, 2), ('ευπ', 0, 2), ('απ', 0, 2), ('εμπ', 0, 2), 
    ('γυρ', -1, 2), ('χρ', -1, 2), ('χωρ', -1, 2), ('αρ', -1, 2), 
    ('αορ', -1, 2), ('χτ', -1, 2), ('αχτ', 9, 2), ('κτ', -1, 2), 
    ('ακτ', 11, 2), ('σχ', -1, 2), ('ασχ', 13, 2), ('ταχ', -1, 2), 
    ('υψ', -1, 2), ('ατα', -1, 2), ('φα', -1, 2), ('ηφα', 18, 2), 
    ('λυγ', -1, 2), ('μεγ', -1, 2), ('ηδ', -1, 2), ('σε', -1, 1), 
    ('ασε', 23, 1), ('πλε', -1, 1), ('κλε', -1, 1), ('εσωκλε', 26, 1), 
    ('δανε', -1, 1), ('εχθ', -1, 2), ('καθ', -1, 2), ('σκ', -1, 2), 
    ('κακ', -1, 2), ('μακ', -1, 2), ('κυλ', -1, 2), ('φιλ', -1, 2), 
    ('μ', -1, 2), ('γεμ', 36, 2), ('αχν', -1, 2), ('συναθρο', -1, 1), 
))
_A11 = make_amongs((  # @0x87620
    ('ιστουσ', -1, 1), ('ιστεσ', -1, 1), ('ιστησ', -1, 1), 
    ('ιστοσ', -1, 1), ('ιστου', -1, 1), ('ιστα', -1, 1), ('ιστε', -1, 1), 
    ('ιστη', -1, 1), ('ιστοι', -1, 1), ('ιστων', -1, 1), ('ιστο', -1, 1), 
))
_A12 = make_amongs((  # @0x87540
    ('σε', -1, 1), ('μετασε', 0, 1), ('μικροσε', 0, 1), ('εγκλε', -1, 1), 
    ('αποκλε', -1, 1), ('δανε', -1, 2), ('αντιδανε', 5, 2), 
))
_A13 = make_amongs((  # @0x87400
    ('τοπικ', -1, 7), ('σκεπτικ', -1, 6), ('γνωστικ', -1, 3), 
    ('αγνωστικ', 2, 1), ('εκλεκτικ', -1, 5), ('ατομικ', -1, 2), 
    ('εθνικ', -1, 4), ('θεατριν', -1, 10), ('αλεξανδριν', -1, 8), 
    ('βυζαντιν', -1, 9), 
))
_A14 = make_amongs((  # @0x87340
    ('ισμουσ', -1, 1), ('ισμοσ', -1, 1), ('ισμου', -1, 1), 
    ('ισμοι', -1, 1), ('ισμων', -1, 1), ('ισμο', -1, 1), 
))
_A15 = make_amongs((  # @0x87300
    ('σ', -1, 1), ('χ', -1, 1), 
))
_A16 = make_amongs((  # @0x87280
    ('αρακια', -1, 1), ('ουδακια', -1, 1), ('αρακι', -1, 1), 
    ('ουδακι', -1, 1), 
))
_A17 = make_amongs((  # @0x86cc0
    ('π', -1, 2), ('κατραπ', 0, 1), ('ρ', -1, 1), ('βρ', 2, 1), 
    ('λαβρ', 3, 1), ('αμβρ', 3, 1), ('πατερ', 2, 2), ('μερ', 2, 1), 
    ('ανθρ', 2, 1), ('κορ', 2, 1), ('σ', -1, 1), ('ναγκασ', 10, 1), 
    ('τοσ', 10, 2), ('μουστ', -1, 1), ('ρυ', -1, 1), ('φ', -1, 1), 
    ('σφ', 15, 1), ('αλισφ', 16, 1), ('νυφ', 15, 2), ('χ', -1, 1), 
    ('β', -1, 2), ('βαμβ', 20, 1), ('σλοβ', 20, 1), ('τσεχοσλοβ', 22, 1), 
    ('καρδ', -1, 2), ('ζ', -1, 2), ('τζ', 25, 1), ('κ', -1, 1), 
    ('σκ', 27, 1), ('καπακ', 27, 1), ('σοκ', 27, 1), ('πλ', -1, 1), 
    ('φυλ', -1, 1), ('λουλ', -1, 1), ('βαλ', -1, 2), ('μαλ', -1, 1), 
    ('γλ', -1, 2), ('τριπολ', -1, 2), ('φαρμ', -1, 1), ('καιμ', -1, 1), 
    ('κλιμ', -1, 1), ('μακρυν', -1, 2), ('σπαν', -1, 1), ('γιαν', -1, 2), 
    ('ηγουμεν', -1, 2), ('κον', -1, 1), 
))
_A18 = make_amongs((  # @0x86bc0
    ('ιτσασ', -1, 1), ('ιτσεσ', -1, 1), ('ιτσα', -1, 1), ('ακια', -1, 1), 
    ('αρακια', 3, 1), ('ακι', -1, 1), ('αρακι', 5, 1), ('ιτσων', -1, 1), 
))
_A19 = make_amongs((  # @0x86b40
    ('ιρ', -1, 1), ('ψαλ', -1, 1), ('αιφν', -1, 1), ('ολο', -1, 1), 
))
_A20 = make_amongs((  # @0x86b00
    ('ε', -1, 1), ('παιχν', -1, 1), 
))
_A21 = make_amongs((  # @0x86aa0
    ('ιδια', -1, 1), ('ιδιων', -1, 1), ('ιδιο', -1, 1), 
))
_A22 = make_amongs((  # @0x869c0
    ('ρ', -1, 1), ('ιβ', -1, 1), ('δ', -1, 1), ('λυκ', -1, 1), 
    ('φραγκ', -1, 1), ('οβελ', -1, 1), ('μην', -1, 1), 
))
_A23 = make_amongs((  # @0x86940
    ('ισκοσ', -1, 1), ('ισκου', -1, 1), ('ισκε', -1, 1), ('ισκο', -1, 1), 
))
_A24 = make_amongs((  # @0x86900
    ('αδεσ', -1, 1), ('αδων', -1, 1), 
))
_A25 = make_amongs((  # @0x867c0
    ('μπαμπ', -1, -1), ('κυρ', -1, -1), ('πατερ', -1, -1), 
    ('πεθερ', -1, -1), ('νταντ', -1, -1), ('γιαγι', -1, -1), 
    ('θει', -1, -1), ('οκ', -1, -1), ('μαμ', -1, -1), ('μαν', -1, -1), 
))
_A26 = make_amongs((  # @0x86780
    ('εδεσ', -1, 1), ('εδων', -1, 1), 
))
_A27 = make_amongs((  # @0x86680
    ('κρασπ', -1, 1), ('υπ', -1, 1), ('δαπ', -1, 1), ('γηπ', -1, 1), 
    ('ιπ', -1, 1), ('εμπ', -1, 1), ('οπ', -1, 1), ('μιλ', -1, 1), 
))
_A28 = make_amongs((  # @0x86640
    ('ουδεσ', -1, 1), ('ουδων', -1, 1), 
))
_A29 = make_amongs((  # @0x86460
    ('σπ', -1, 1), ('φρ', -1, 1), ('σ', -1, 1), ('λιχ', -1, 1), 
    ('τραγ', -1, 1), ('φε', -1, 1), ('αρκ', -1, 1), ('σκ', -1, 1), 
    ('καλιακ', -1, 1), ('λουλ', -1, 1), ('φλ', -1, 1), ('πεταλ', -1, 1), 
    ('βελ', -1, 1), ('χν', -1, 1), ('πλεξ', -1, 1), 
))
_A30 = make_amongs((  # @0x86420
    ('εωσ', -1, 1), ('εων', -1, 1), 
))
_A31 = make_amongs((  # @0x86320
    ('π', -1, 1), ('παρ', -1, 1), ('δ', -1, 1), ('ιδ', 2, 1), ('θ', -1, 1), 
    ('γαλ', -1, 1), ('ελ', -1, 1), ('ν', -1, 1), 
))
_A32 = make_amongs((  # @0x862c0
    ('ιου', -1, 1), ('ια', -1, 1), ('ιων', -1, 1), 
))
_A33 = make_amongs((  # @0x86240
    ('ικου', -1, 1), ('ικα', -1, 1), ('ικων', -1, 1), ('ικο', -1, 1), 
))
_A34 = make_amongs((  # @0x85dc0
    ('καλπ', -1, 1), ('γερ', -1, 1), ('πλιατσ', -1, 1), ('πετσ', -1, 1), 
    ('πιτσ', -1, 1), ('φυσ', -1, 1), ('χασ', -1, 1), ('μποσ', -1, 1), 
    ('σερτ', -1, 1), ('μπαγιατ', -1, 1), ('νιτ', -1, 1), ('πικαντ', -1, 1), 
    ('εξωδ', -1, 1), ('αδ', -1, 1), ('καταδ', 13, 1), ('συναδ', 13, 1), 
    ('αντιδ', -1, 1), ('ενδ', -1, 1), ('υποδ', -1, 1), ('πρωτοδ', -1, 1), 
    ('φυλοδ', -1, 1), ('ηθ', -1, 1), ('ανηθ', 21, 1), ('ξικ', -1, 1), 
    ('μουλ', -1, 1), ('αλ', -1, 1), ('αμμοχαλ', 25, 1), ('συνομηλ', -1, 1), 
    ('μπολ', -1, 1), ('βρωμ', -1, 1), ('τσαμ', -1, 1), ('μπαν', -1, 1), 
    ('αμαν', -1, 1), ('καλλιν', -1, 1), ('ποστελν', -1, 1), 
    ('φιλον', -1, 1), 
))
_A35 = make_amongs((  # @0x85d20
    ('ουσαμε', -1, 1), ('ησαμε', -1, 1), ('αγαμε', -1, 1), 
    ('ηκαμε', -1, 1), ('ηθηκαμε', 3, 1), 
))
_A36 = make_amongs((  # @0x85ba0
    ('αναπ', -1, 1), ('πικρ', -1, 1), ('αποστ', -1, 1), ('ποτ', -1, 1), 
    ('χ', -1, 1), ('σιχ', 4, 1), ('βουβ', -1, 1), ('πεθ', -1, 1), 
    ('ξεθ', -1, 1), ('αποθ', -1, 1), ('αποκ', -1, 1), ('ουλ', -1, 1), 
))
_A37 = make_amongs((  # @0x85b60
    ('τρ', -1, 1), ('τσ', -1, 1), 
))
_A38 = make_amongs((  # @0x85a00
    ('ουσανε', -1, 1), ('ησανε', -1, 1), ('ουντανε', -1, 1), 
    ('ιουντανε', 2, 1), ('οντανε', -1, 1), ('ιοντανε', 4, 1), 
    ('οτανε', -1, 1), ('ιοτανε', 6, 1), ('αγανε', -1, 1), ('ηκανε', -1, 1), 
    ('ηθηκανε', 9, 1), 
))
_A39 = make_amongs((  # @0x84e20
    ('π', -1, 1), ('σπ', 0, 1), ('πολυδαπ', 0, 1), ('αδαπ', 0, 1), 
    ('χαμηλοδαπ', 0, 1), ('τσοπ', 0, 1), ('κοπ', 0, 1), ('υποκοπ', 6, 1), 
    ('περιτρ', -1, 1), ('ουρ', -1, 1), ('ερ', -1, 1), ('βετερ', 10, 1), 
    ('γερ', 10, 1), ('λουθηρ', -1, 1), ('κορμορ', -1, 1), ('σ', -1, 1), 
    ('σαρακατσ', 15, 1), ('θυσ', 15, 1), ('βασ', 15, 1), ('πολισ', 15, 1), 
    ('καστ', -1, 1), ('διατ', -1, 1), ('πλατ', -1, 1), ('τσαρλατ', -1, 1), 
    ('τετ', -1, 1), ('πουριτ', -1, 1), ('σουλτ', -1, 1), ('ζωντ', -1, 1), 
    ('μαιντ', -1, 1), ('φ', -1, 1), ('πενταρφ', 29, 1), ('κοιλαρφ', 29, 1), 
    ('ορφ', 29, 1), ('διαφ', 29, 1), ('στεφ', 29, 1), ('φωτοστεφ', 34, 1), 
    ('περηφ', 29, 1), ('υπερηφ', 36, 1), ('χ', -1, 1), ('πολυμηχ', 38, 1), 
    ('αμηχ', 38, 1), ('βιομηχ', 38, 1), ('μικροβιομηχ', 41, 1), 
    ('μεγλοβιομηχ', 41, 1), ('καπνοβιομηχ', 41, 1), ('λιχ', 38, 1), 
    ('ταβ', -1, 1), ('νταβ', 46, 1), ('ψηλοταβ', 46, 1), ('λιβ', -1, 1), 
    ('κλιβ', 49, 1), ('ξηροκλιβ', 50, 1), ('γ', -1, 1), ('ανοργ', 52, 1), 
    ('ενοργ', 52, 1), ('αγ', 52, 1), ('τραγ', 55, 1), ('τσαγ', 55, 1), 
    ('τσιγγ', 52, 1), ('ατσιγγ', 58, 1), ('αθιγγ', 52, 1), ('στεγ', 52, 1), 
    ('απηγ', 52, 1), ('σιγ', 52, 1), ('καλπουζ', -1, 1), ('θ', -1, 1), 
    ('μωαμεθ', 65, 1), ('πιθ', 65, 1), ('απιθ', 67, 1), ('βασκ', -1, 1), 
    ('βραχυκ', -1, 1), ('δεκ', -1, 1), ('πελεκ', -1, 1), ('ικ', -1, 1), 
    ('ανικ', 73, 1), ('βουλκ', -1, 1), ('πλ', -1, 1), ('διπλ', 76, 1), 
    ('ψυχοπλ', 76, 1), ('λαοπλ', 76, 1), ('ουλ', -1, 1), ('γαλ', -1, 1), 
    ('βαθυγαλ', 81, 1), ('καταγαλ', 81, 1), ('ολογαλ', 81, 1), 
    ('καστελ', -1, 1), ('μελ', -1, 1), ('πορτολ', -1, 1), ('μ', -1, 1), 
    ('δραδουμ', 88, 1), ('βραχμ', 88, 1), ('ολιγοδαμ', 88, 1), 
    ('μουσουλμ', 88, 1), ('ν', -1, 1), ('αμερικαν', 93, 1), 
))
_A40 = make_amongs((  # @0x84e00
    ('ησετε', -1, 1), 
))
_A41 = make_amongs((  # @0x84a20
    ('πυρ', -1, 1), ('ευρ', -1, 1), ('χωρ', -1, 1), ('βαρ', -1, 1), 
    ('βρ', -1, 1), ('αιρ', -1, 1), ('φορ', -1, 1), ('νετ', -1, 1), 
    ('σχ', -1, 1), ('συνδ', -1, 1), ('ενδ', -1, 1), ('οδ', -1, 1), 
    ('υπερθ', -1, 1), ('σθ', -1, 1), ('ευθ', -1, 1), ('ραθ', -1, 1), 
    ('ταθ', -1, 1), ('διαθ', -1, 1), ('καθ', -1, 1), ('τιθ', -1, 1), 
    ('εκθ', -1, 1), ('συνθ', -1, 1), ('ενθ', -1, 1), ('ροθ', -1, 1), 
    ('αρκ', -1, 1), ('ωφελ', -1, 1), ('βολ', -1, 1), ('συν', -1, 1), 
    ('αιν', -1, 1), ('πον', -1, 1), ('ρον', -1, 1), 
))
_A42 = make_amongs((  # @0x84700
    ('σερπ', -1, 1), ('κοπ', -1, 1), ('θαρρ', -1, 1), ('ντρ', -1, 1), 
    ('αβαρ', -1, 1), ('εναρ', -1, 1), ('αβρ', -1, 1), ('μπορ', -1, 1), 
    ('υ', -1, 1), ('συρφ', -1, 1), ('νιφ', -1, 1), ('παγ', -1, 1), 
    ('δ', -1, 1), ('αδ', 12, 1), ('θ', -1, 1), ('αθ', 14, 1), 
    ('σκ', -1, 1), ('τοκ', -1, 1), ('απλ', -1, 1), ('παρακαλ', -1, 1), 
    ('σκελ', -1, 1), ('εμ', -1, 1), ('αν', -1, 1), ('βεν', -1, 1), 
    ('βαρον', -1, 1), 
))
_A43 = make_amongs((  # @0x846c0
    ('ωντασ', -1, 1), ('οντασ', -1, 1), 
))
_A44 = make_amongs((  # @0x84680
    ('ομαστε', -1, 1), ('ιομαστε', 0, 1), 
))
_A45 = make_amongs((  # @0x845c0
    ('π', -1, 1), ('απ', 0, 1), ('ακαταπ', 1, 1), ('συμπ', 0, 1), 
    ('ασυμπ', 3, 1), ('αμεταμφ', -1, 1), 
))
_A46 = make_amongs((  # @0x844a0
    ('αρ', -1, 1), ('νισ', -1, 1), ('ζ', -1, 1), ('αλ', -1, 1), 
    ('παρακαλ', 3, 1), ('εκτελ', -1, 1), ('μ', -1, 1), ('ξ', -1, 1), 
    ('προ', -1, 1), 
))
_A47 = make_amongs((  # @0x84440
    ('ηθηκεσ', -1, 1), ('ηθηκα', -1, 1), ('ηθηκε', -1, 1), 
))
_A48 = make_amongs((  # @0x84380
    ('σφ', -1, 1), ('ναρθ', -1, 1), ('πιθ', -1, 1), ('οθ', -1, 1), 
    ('σκουλ', -1, 1), ('σκωλ', -1, 1), 
))
_A49 = make_amongs((  # @0x842e0
    ('θ', -1, 1), ('προσθ', 0, 1), ('παρακαταθ', 0, 1), ('διαθ', 0, 1), 
    ('συνθ', 0, 1), 
))
_A50 = make_amongs((  # @0x84280
    ('ηκεσ', -1, 1), ('ηκα', -1, 1), ('ηκε', -1, 1), 
))
_A51 = make_amongs((  # @0x84100
    ('βλεπ', -1, 1), ('ποδαρ', -1, 1), ('πρωτ', -1, 1), ('κυματ', -1, 1), 
    ('πανταχ', -1, 1), ('λαχ', -1, 1), ('φαγ', -1, 1), ('ληγ', -1, 1), 
    ('φρυδ', -1, 1), ('μαντιλ', -1, 1), ('μαλλ', -1, 1), ('ομ', -1, 1), 
))
_A52 = make_amongs((  # @0x83de0
    ('εκλιπ', -1, 1), ('ρ', -1, 1), ('αναρρ', 1, 1), ('ενδιαφερ', 1, 1), 
    ('πατ', -1, 1), ('καθαρευ', -1, 1), ('δευτερευ', -1, 1), 
    ('λεχ', -1, 1), ('τσα', -1, 1), ('χαδ', -1, 1), ('μεδ', -1, 1), 
    ('λαμπιδ', -1, 1), ('δε', -1, 1), ('πλε', -1, 1), ('μεσαζ', -1, 1), 
    ('δεσποζ', -1, 1), ('αιθ', -1, 1), ('φαρμακ', -1, 1), ('αγκ', -1, 1), 
    ('ανηκ', -1, 1), ('λ', -1, 1), ('μ', -1, 1), ('αμ', 21, 1), 
    ('βρομ', 21, 1), ('υποτειν', -1, 1), 
))
_A53 = make_amongs((  # @0x83d80
    ('ουσεσ', -1, 1), ('ουσα', -1, 1), ('ουσε', -1, 1), 
))
_A54 = make_amongs((  # @0x83c00
    ('ρπ', -1, 1), ('πρ', -1, 1), ('φρ', -1, 1), ('χορτ', -1, 1), 
    ('σφ', -1, 1), ('οφ', -1, 1), ('ψοφ', 5, -1), ('λοχ', -1, 1), 
    ('ναυλοχ', 7, -1), ('πελ', -1, 1), ('λλ', -1, 1), ('σμην', -1, 1), 
))
_A55 = make_amongs((  # @0x83680
    ('π', -1, 1), ('ασπ', 0, 1), ('ανυπ', 0, 1), ('αρτιπ', 0, 1), 
    ('αειπ', 0, 1), ('συμπ', 0, 1), ('προσωποπ', 0, 1), ('σιδηροπ', 0, 1), 
    ('δροσοπ', 0, 1), ('νεοπ', 0, 1), ('κροκαλοπ', 0, 1), ('ολοπ', 0, 1), 
    ('ρ', -1, 1), ('τρ', 12, 1), ('ουρ', 12, 1), ('ασπαρ', 12, 1), 
    ('χαρ', 12, 1), ('αχαρ', 16, 1), ('απερ', 12, 1), ('τ', -1, 1), 
    ('ανυστ', 19, 1), ('αβαστ', 19, 1), ('προστ', 19, 1), 
    ('αιμοστ', 19, 1), ('διατ', 19, 1), ('επιτ', 19, 1), ('συντ', 19, 1), 
    ('υποτ', 19, 1), ('αποτ', 19, 1), ('ομοτ', 19, 1), ('νομοτ', 29, 1), 
    ('ναυ', -1, 1), ('πολυφ', -1, 1), ('αφ', -1, 1), ('ξεφ', -1, 1), 
    ('αδηφ', -1, 1), ('παμφ', -1, 1), ('αμαλλι', -1, 1), ('λ', -1, 1), 
    ('αμαλ', 38, 1), ('μ', -1, 1), ('ουλαμ', 40, 1), ('εν', -1, 1), 
    ('δερβεν', 42, 1), 
))
_A56 = make_amongs((  # @0x83620
    ('αγεσ', -1, 1), ('αγα', -1, 1), ('αγε', -1, 1), 
))
_A57 = make_amongs((  # @0x835c0
    ('ησου', -1, 1), ('ησα', -1, 1), ('ησε', -1, 1), 
))
_A58 = make_amongs((  # @0x83500
    ('ν', -1, 1), ('επταν', 0, 1), ('δωδεκαν', 0, 1), ('χερσον', 0, 1), 
    ('μεγαλον', 0, 1), ('ερημον', 0, 1), 
))
_A59 = make_amongs((  # @0x834e0
    ('ηστε', -1, 1), 
))
_A60 = make_amongs((  # @0x833a0
    ('χρ', -1, 1), ('δυσχρ', 0, 1), ('ευχρ', 0, 1), ('αχρ', 0, 1), 
    ('κοινοχρ', 0, 1), ('παλιμψ', -1, 1), ('σβ', -1, 1), ('ασβ', 6, 1), 
    ('απλ', -1, 1), ('αειμν', -1, 1), 
))
_A61 = make_amongs((  # @0x83340
    ('ουνε', -1, 1), ('ησουνε', 0, 1), ('ηθουνε', 0, 1), 
))
_A62 = make_amongs((  # @0x83280
    ('ρ', -1, 1), ('στραβομουτσ', -1, 1), ('κακομουτσ', -1, 1), 
    ('σπι', -1, 1), ('ν', -1, 1), ('εξων', 4, 1), 
))
_A63 = make_amongs((  # @0x83220
    ('ουμε', -1, 1), ('ησουμε', 0, 1), ('ηθουμε', 0, 1), 
))
_A64 = make_amongs((  # @0x83140
    ('ασουσ', -1, 1), ('παρασουσ', 0, 1), ('αλλοσουσ', -1, 1), 
    ('φ', -1, 1), ('χ', -1, 1), ('αζ', -1, 1), ('ωριοπλ', -1, 1), 
))
_A65 = make_amongs((  # @0x830e0
    ('ματοσ', -1, 1), ('ματα', -1, 1), ('ματων', -1, 1), 
))
_A66 = make_amongs((  # @0x82660
    ('υσ', -1, 1), ('ουσ', 0, 1), ('ασ', -1, 1), ('εσ', -1, 1), 
    ('ησεσ', 3, 1), ('ηδεσ', 3, 1), ('ησ', -1, 1), ('εισ', -1, 1), 
    ('ηθεισ', 7, 1), ('οσ', -1, 1), ('υ', -1, 1), ('ου', 10, 1), 
    ('ω', -1, 1), ('ησω', 12, 1), ('αω', 12, 1), ('ηθω', 12, 1), 
    ('α', -1, 1), ('ιουμα', 16, 1), ('οσουνα', 16, 1), ('ιοσουνα', 18, 1), 
    ('ομουνα', 16, 1), ('ιομουνα', 20, 1), ('ε', -1, 1), 
    ('ιεσαστε', 22, 1), ('οσαστε', 22, 1), ('ιοσαστε', 24, 1), 
    ('ουμαστε', 22, 1), ('ιουμαστε', 26, 1), ('ιεμαστε', 22, 1), 
    ('ουσατε', 22, 1), ('ησατε', 22, 1), ('αγατε', 22, 1), 
    ('ηκατε', 22, 1), ('ηθηκατε', 32, 1), ('ειτε', 22, 1), 
    ('ηθειτε', 34, 1), ('η', -1, 1), ('ι', -1, 1), ('ασαι', 37, 1), 
    ('εσαι', 37, 1), ('ιεσαι', 39, 1), ('αται', 37, 1), ('εται', 37, 1), 
    ('ιεται', 42, 1), ('ουνται', 37, 1), ('ιουνται', 44, 1), 
    ('ονται', 37, 1), ('ουμαι', 37, 1), ('αμαι', 37, 1), ('ιεμαι', 37, 1), 
    ('ομαι', 37, 1), ('ει', 37, 1), ('ησει', 51, 1), ('αει', 51, 1), 
    ('ηθει', 51, 1), ('οι', 37, 1), ('ουν', -1, 1), ('ησουν', 56, 1), 
    ('οσουν', 56, 1), ('ιοσουν', 58, 1), ('ηθουν', 56, 1), 
    ('ομουν', 56, 1), ('ιομουν', 61, 1), ('ων', -1, 1), ('ηδων', 63, 1), 
    ('αν', -1, 1), ('ουσαν', 65, 1), ('οντουσαν', 66, 1), 
    ('ιοντουσαν', 67, 1), ('ησαν', 65, 1), ('οσασταν', 65, 1), 
    ('ιοσασταν', 70, 1), ('ομασταν', 65, 1), ('ιομασταν', 72, 1), 
    ('ουνταν', 65, 1), ('ιουνταν', 74, 1), ('ονταν', 65, 1), 
    ('ιονταν', 76, 1), ('οταν', 65, 1), ('ιοταν', 78, 1), ('αγαν', 65, 1), 
    ('ηκαν', 65, 1), ('ηθηκαν', 81, 1), ('ο', -1, 1), 
))
_A67 = make_amongs((  # @0x82560
    ('εστερ', -1, 1), ('υτερ', -1, 1), ('ωτερ', -1, 1), ('οτερ', -1, 1), 
    ('εστατ', -1, 1), ('υτατ', -1, 1), ('ωτατ', -1, 1), ('οτατ', -1, 1), 
))


def _enc(s: str) -> bytes:
    return s.encode("utf-8")


def _utf8_len(w: bytes) -> int:
    return sum(1 for b in w if b & 0xC0 != 0x80)


def _prev_char(w: bytes, c: int) -> str | None:
    """Decode the character ending at byte offset c (None at start)."""
    if c <= 0:
        return None
    i = c - 1
    while i > 0 and w[i] & 0xC0 == 0x80:
        i -= 1
    return bytes(w[i:c]).decode("utf-8")


def _ends(w: bytes, c: int, s: bytes) -> bool:
    return c >= len(s) and w[c - len(s):c] == s


def stem(word: str) -> str:
    w = bytearray(word.encode("utf-8"))

    # tolower (backwards repeat over a_0; '' -> next = back one char)
    c = len(w)
    while True:
        ket = c
        res, nc = find_among_b(w, c, 0, _A0)
        if res == 0:
            break
        if res == 25:  # '' entry: hop back one character
            if c <= 0:
                break
            c -= 1
            while c > 0 and w[c] & 0xC0 == 0x80:
                c -= 1
            continue
        repl = _enc(_LOWER[res])
        w[nc:ket] = repl
        c = nc

    if _utf8_len(w) <= 2:
        return bytes(w).decode("utf-8")

    test1 = True
    # Tracks whether any step has matched yet: the compiled
    # `('αγαμε' atlimit <- 'αγαμ')` of step5a slices with the stale
    # bra of the runtime, which is 0 when nothing fired (replace) and
    # the word end after any earlier match (insert).
    fired = False

    # step 1 — exception rewrites (ends-with; a_1)
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A1)
    if res:
        w[nc:l] = _enc(_STEP1_REPL[res])
        test1 = False
        fired = True

    # helper: the recurring shape of steps S1-S10 / 2x / 5x:
    #   strip a suffix, then re-attach a particle when an exception
    #   among matches the remaining word (atlimit = exactly, else
    #   ends-with).
    def _append_if(table, repl_by_res, atlimit):
        nonlocal w
        l2 = len(w)
        r2, n2 = find_among_b(w, l2, 0, table)
        if r2 and (not atlimit or n2 == 0):
            rep = repl_by_res.get(r2) if isinstance(repl_by_res, dict) \
                else repl_by_res
            if rep is not None:
                w += _enc(rep)
                return True
        return False

    # steps1 — 'ιζ*' verbs (a_3), exceptions a_2
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A3)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A2, {1: "ι", 2: "ιζ"}, atlimit=True)

    # steps2 — 'ωθηκ*' (a_5), exceptions a_4 -> 'ων'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A5)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A4, "ων", atlimit=True)

    # steps3 — 'ισ*' past (a_7); special whole-word 'ισα' -> 'ισ'
    # (the compiled code errors here, see module docstring), else
    # exceptions a_6
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A7)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if w == b"\xce\xb9\xcf\x83\xce\xb1":  # exactly 'ισα'
            w = bytearray("ισ".encode("utf-8"))
        else:
            _append_if(_A6, {1: "ι", 2: "ισ"}, atlimit=True)

    # steps4 — 'ισ*' present (a_9), exceptions a_8 -> 'ι'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A9)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A8, "ι", atlimit=True)

    # steps5 — 'ιστ*' (a_11), exceptions a_10
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A11)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A10, {1: "ι", 2: "ιστ"}, atlimit=True)

    # steps6 — 'ισμ*' (a_14): whole-word exceptions a_12, else the
    # ik/in rewrites a_13 (ends-with replacement)
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A14)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if not _append_if(_A12, {1: "ισμ", 2: "ι"}, atlimit=True):
            l2 = len(w)
            r2, n2 = find_among_b(w, l2, 0, _A13)
            if r2 and r2 <= 10:
                w[n2:l2] = _enc(_A13_REPL[r2])

    # steps7 — 'αρακι(α)/ουδακι(α)' (a_16), exceptions a_15 -> 'αρακ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A16)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A15, "αρακ", atlimit=True)

    # steps8 — diminutives (a_18): exceptions a_17, else ends-'κορ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A18)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if not _append_if(_A17, {1: "ακ", 2: "ιτσ"}, atlimit=True):
            if _ends(w, len(w), "κορ".encode("utf-8")):
                w += _enc("ιτσ")

    # steps9 — 'ιδι*' (a_21): exceptions a_19 (whole word) or a_20
    # (ends-with), both -> 'ιδ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A21)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if not _append_if(_A19, "ιδ", atlimit=True):
            _append_if(_A20, "ιδ", atlimit=False)

    # steps10 — 'ισκ*' (a_23), exceptions a_22 -> 'ισκ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A23)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A22, "ισκ", atlimit=True)

    # step2a — 'αδεσ/αδων': delete; add 'αδ' unless ends with a_25
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A24)
    if res:
        del w[nc:l]
        fired = True
        r2, _n2 = find_among_b(w, len(w), 0, _A25)
        if not r2:
            w += _enc("αδ")

    # step2b — 'εδεσ/εδων': delete; ends-with a_27 -> 'εδ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A26)
    if res:
        del w[nc:l]
        fired = True
        _append_if(_A27, "εδ", atlimit=False)

    # step2c — 'ουδεσ/ουδων': delete; ends-with a_29 -> 'ουδ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A28)
    if res:
        del w[nc:l]
        fired = True
        _append_if(_A29, "ουδ", atlimit=False)

    # step2d — 'εωσ/εων': delete; whole-word a_31 -> 'ε'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A30)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A31, "ε", atlimit=True)

    # step3 — 'ια/ιου/ιων': delete; vowel -> 'ι'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A32)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if _prev_char(w, len(w)) in _V:
            w += _enc("ι")

    # step4 — 'ικα/ικο/ικου/ικων': delete; then the compiled two-block
    # shape: ([] v <- 'ικ') falling INTO ([substring] atlimit
    # among(a_34) <- 'ικ') with the stale cursor/ket of the first
    # block (so a vowel preceded by a whole-word a_34 entry is itself
    # rewritten to 'ικ': 'αλυικα' -> 'αλικικ', as the library does).
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A33)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        l2 = len(w)
        ch = _prev_char(w, l2)
        if ch in _V:
            p = l2 - len(_enc(ch))
            w += _enc("ικ")
            r2, n2 = find_among_b(w, p, 0, _A34)
            if r2 and n2 == 0:
                w[p:l2] = _enc("ικ")
        else:
            _append_if(_A34, "ικ", atlimit=True)

    # step5a — three parts.  Part 1 is the upstream source quirk
    # `('αγαμε' atlimit <- 'αγαμ')` with no bracket operator: the
    # slice uses the stale bra, replacing the whole word when no step
    # has fired and appending when one has ('αγαμεισα' ->
    # 'αγαμεαγαμ', as the compiled library does).
    if w == "αγαμε".encode("utf-8"):
        if fired:
            w += _enc("αγαμ")
        else:
            w = bytearray("αγαμ".encode("utf-8"))
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A35)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
    ame = "αμε".encode("utf-8")
    if _ends(w, len(w), ame):
        del w[len(w) - len(ame):]
        test1 = False
        _append_if(_A36, "αμ", atlimit=True)

    # step5b — '*ανε' long forms (a_38) with 'τρ/τσ' -> 'αγαν'; then
    # 'ανε' with v2 or a_39 -> 'αν'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A38)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A37, "αγαν", atlimit=True)
    ane = "ανε".encode("utf-8")
    if _ends(w, len(w), ane):
        del w[len(w) - len(ane):]
        test1 = False
        l2 = len(w)
        ch = _prev_char(w, l2)
        if ch in _V2:
            # compiled two-block shape (see step4): append, then the
            # atlimit among re-slices the vowel span
            p = l2 - len(_enc(ch))
            w += _enc("αν")
            r2, n2 = find_among_b(w, p, 0, _A39)
            if r2 and n2 == 0:
                w[p:l2] = _enc("αν")
        else:
            _append_if(_A39, "αν", atlimit=True)

    # step5c — 'ησετε' strip; then 'ετε' with v2, a_41 (ends-with) or
    # a_42 (whole-word) -> 'ετ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A40)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
    ete = "ετε".encode("utf-8")
    if _ends(w, len(w), ete):
        del w[len(w) - len(ete):]
        test1 = False
        l2 = len(w)
        ch = _prev_char(w, l2)
        p = None
        if ch in _V2:
            p = l2 - len(_enc(ch))
            w += _enc("ετ")
        else:
            r1, n1 = find_among_b(w, l2, 0, _A41)
            if r1:
                p = n1
                w += _enc("ετ")
        if p is not None:
            # compiled two-block shape (see step4): the atlimit among
            # runs at the stale cursor and re-slices [p, old end]
            r2, n2 = find_among_b(w, p, 0, _A42)
            if r2 and n2 == 0:
                w[p:l2] = _enc("ετ")
        else:
            _append_if(_A42, "ετ", atlimit=True)

    # step5d — 'οντασ/ωντασ': 'αρχ' (whole word) -> 'οντ', ends-'κρε'
    # -> 'ωντ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A43)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if w == "αρχ".encode("utf-8"):
            w += _enc("οντ")
        elif _ends(w, len(w), "κρε".encode("utf-8")):
            w += _enc("ωντ")

    # step5e — 'ομαστε/ιομαστε': whole-word 'ον' -> append 'ομαστ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A44)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if w == "ον".encode("utf-8"):
            w += _enc("ομαστ")

    # step5f — 'ιεστε' with a_45, then 'εστε' with a_46, both -> 'ιεστ'
    ieste = "ιεστε".encode("utf-8")
    if _ends(w, len(w), ieste):
        del w[len(w) - len(ieste):]
        test1 = False
        _append_if(_A45, "ιεστ", atlimit=True)
    este = "εστε".encode("utf-8")
    if _ends(w, len(w), este):
        del w[len(w) - len(este):]
        test1 = False
        _append_if(_A46, "ιεστ", atlimit=True)

    # step5g — 'ηθηκ*' strip (a_47); then 'ηκ*' (a_50) with a_48
    # (ends-with) or a_49 (whole-word) -> 'ηκ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A47)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A50)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if not _append_if(_A48, "ηκ", atlimit=False):
            _append_if(_A49, "ηκ", atlimit=True)

    # step5h — 'ουσα/ουσεσ/ουσε': a_51 (ends-with) or a_52 (whole
    # word) -> 'ουσ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A53)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if not _append_if(_A51, "ουσ", atlimit=False):
            _append_if(_A52, "ουσ", atlimit=True)

    # step5j — 'ησε/ησου/ησα': whole-word a_58 -> 'ησ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A57)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A58, "ησ", atlimit=True)

    # step5i — 'αγα/αγεσ/αγε': ends-'κολλ', else a_54 (ends-with,
    # ψοφ/ναυλοχ poisoned), else a_55 (whole word) -> 'αγ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A56)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        if _ends(w, len(w), "κολλ".encode("utf-8")):
            w += _enc("αγ")
        else:
            r2, _n2 = find_among_b(w, len(w), 0, _A54)
            if r2 == 1:
                w += _enc("αγ")
            elif r2 == 0:
                _append_if(_A55, "αγ", atlimit=True)
            # r2 == -1 (ψοφ/ναυλοχ): hard fail, no a_55 attempt

    # step5k — 'ηστε': whole-word a_60 -> 'ηστ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A59)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A60, "ηστ", atlimit=True)

    # step5l — 'ουνε/ησουνε/ηθουνε': whole-word a_62 -> 'ουν'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A61)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A62, "ουν", atlimit=True)

    # step5m — 'ουμε/ησουμε/ηθουμε': whole-word a_64 -> 'ουμ'
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A63)
    if res:
        del w[nc:l]
        fired = True
        test1 = False
        _append_if(_A64, "ουμ", atlimit=True)

    # step6 — 'ματ*' -> 'μα'; then, if no earlier step fired, the
    # generic ending removal (a_66)
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A65)
    if res:
        w[nc:l] = _enc("μα")
    if test1:
        l = len(w)
        res, nc = find_among_b(w, l, 0, _A66)
        if res:
            del w[nc:l]
        fired = True

    # step7 — comparatives (a_67)
    l = len(w)
    res, nc = find_among_b(w, l, 0, _A67)
    if res:
        del w[nc:l]
        fired = True

    return bytes(w).decode("utf-8")
