"""Golden tests for the target-URL crackers — the reference's OWN
gtest cases, REAL production ciphers included
(baidu_target_url_test.cc:13-42, google_target_url_test.cc:13-40)."""

from spider_ray.kernels.targeturl import (
    google_target_url,
    parse_baidu_target_url,
    parse_google_target_url,
)

BAIDU_CASES = [
    ('http://www.baidu.com/link?url=b68b8849e523231b472fe233fb98e69b9aa2ff892641b3ff64c09a93c595000c264caaf67781a99f70fe1d9c69fbc3007ca70c4bf12589bb9913f2f005444c149a292186c2f3e7bee21969ff9efade1f65580f5f35d09a76b5761d03e8e38b73cc4a1d6f054dce9be21bd7f0c950678775f624bfdaea9e36532a51ea1fa315e5e27ae2412ad11b36bb1bb7a077b09eeabccee157aa5d3aa7e26a7e4d3a6fe42bb7518c359fc01b3b4ccc5ff49ee3a7df24e7465782fc674f9ee340f810e67ded899e2d4c27d75db115b0d120498c257978460fb7edffa1a79941fc7c791f8feabc9b79bf768182002b4683b842c12b9c1edfd7cd6e76ffd5723603dfca14b39389477a8bf2d29eabe135870df430d8702be49c0afee8b2940cf66be629562c73a9b97dc6881a9993c61b45d2a2e45f1690229e83fdbda8e68c0882e913b1176a6e6029020a736e42fe3d1a2f595f1ac41e0c861c31e093dbe82a9f3f9869ebac5573358cc3c0659257bfcf546427d385e7f37035b5054d6843da279f6a',
     'http://www.imeigu.com/DD', True),
    ('http://www.baidu.com/link?url=fc84924cba617f4c4b6bf965e09fa7839af1dbdc3518b3af29cd9a91e39e4528367ea8b277d28e9571ea1dbf68f8c84d59f05458f27b9ba9b012b2ed0f1b0d459c276fcb8ee7ebc9f3337ff6caa6c0106155174768de9923ba6b1452a4b58238c3415c20555b8294d610dde5da427ee32fa034fed5e09f7d141d519d0ee747eef373e95976d7432da50eb2932c8e8fffb6c5ab54a35e7ba5fc237f417c72b234e44a942ddef641690ddc14a8c6fca4863fbf504f90e561129cac40fc01ed68b5819f730822ca42bb08f0c05251c0282f324116b4faff8284d140df39321b93fbe1863fe778cfd34564418aeb1bf320811dd496c67266e1d7723f4ad9cc25a68090474ab0a8c190ebe52cc01ab227c16a66929015c0b0faa900ae7aec3254186cb3b633d9c5539e908b494cdfb9e61d0d9a3a99dafdbdbcb8885595ab4bb1377a2855241f47606d56bf3f1e1c575719984a0097587cf7d494a175b210882debac5573358cc3c0659257bfcf546427d385f7fb6637ab5e006441985bb4482706fe62a03ee164ccf05eed52ec4838ffa0438d8d2fa3d5405c38611a0108ffd58a689b8be437c8e03ecea4915cdf8871',
     'http://www.yesky.com/SoftChannel/72348973209223168/20040812/1841862.shtml', True),
    ('http://www.hao123.com',
     'http://www.hao123.com', True),
    ('http://www.baidu.com/link?url=84924cba617f4c4b6bf965e09fa7839af1dbdc3518b3af29cd9a91e39e4528367ea8b277d28e9571ea1dbf68f8c84d59f05458f27b9ba9b012b2ed0f1b0d459c276fcb8ee7ebc9f3337ff6caa6c0106155174768de9923ba6b1452a4b58238c3415c20555b8294d610dde5da427ee32fa034fed5e09f7d141d519d0ee747eef373e95976d7432da50eb2932c8e8fffb6c5ab54a35e7ba5fc237f417c72b234e44a942ddef641690ddc14a8c6fca4863fbf504f90e561129cac40fc01ed68b5819f730822ca42bb08f0c05251c0282f324116b4faff8284d140df39321b93fbe1863fe778cfd34564418aeb1bf320811dd496c67266e1d7723f4ad9cc25a68090474ab0a8c190ebe52cc01ab227c16a66929015c0b0faa900ae7aec3254186cb3b633d9c5539e908b494cdfb9e61d0d9a3a99dafdbdbcb8885595ab4bb1377a2855241f47606d56bf3f1e1c575719984a0097587cf7d494a175b210882debac5573358cc3c0659257bfcf546427d385f7fb6637ab5e006441985bb4482706fe62a03ee164ccf05eed52ec4838ffa0438d8d2fa3d5405c38611a0108ffd58a689b8be437c8e03ecea4915cdf8871',
     '', False),
    ('http://www.baidu.com/link?url=a184964ce362254b5c2fe32abe94a884a6e8c0962218c9e338d199d3aad45625220ea4ed60ccaa9c29a958cf7ce5c1484cbb5b41ea7385f7b75feace0a1b506ac0615a959eaef6d0a5697cecdd',
     'http://www.kuaidi100.com/network/netList_10_210500.htm', True),
    ('http://www.baidu.com/link?url=92cf9b04fd247c4e5220be23bd99b794a6e8c0962218c9e338d199d3aad45625220eadf17bd1ab9974fc1acf7ce4831350bf4b53aa6281aaa968fbf20c1a501a923e77d7e6f0a58fba0151adf2bb854c547a54687092af6bea24086e85f0e25a9618753c430c9df1bf598da09c632f9419e4069accb1be12444211f55ebe77c3b826857514850461f74bffe214ddc8ad87e2f5168a19228ac83d5f012821d76ea115bc6ccfab587c51994a9e84a993ed6bfc6909d5b67a7ccf8037962bd046d9c9f26d510f8869d351a1e64c06af6b602f0922f1b1e0efcfc36de7162a07baccddd423a84bdeea2342158fe45ff3',
     'http://www.bizteller.cn/trade/corpReport/corpInfo/FE5B769ED0D05C9584AA2CF35D0537D71573A17E6AE52EC966A74AA91FDF1396791B311AA82F41BD2E918A775E78501719D48CA91D0107D5B7FCDCE1E04C8FF22E24E7745A585361CEB60CFE726E2BEC.html', True),
    ('http://www.baidu.com/link?url=a2d78843fa307d471164ff31ee92e9ddcfe78d982118b6f22ccc93a9e0905a733858bbec25cdbcdc68f510bf70eec10f59b34556f57080b7aa59fef44f0f5e6b8c7521f9c2e4edbee36430e9d9fc990d6857014037c49e7bf67a4c71b5afe178cb5c5f52185482d9a10fc0e4c04240d11cbb21a891add8720817519a18ee41fffb7aa34239cc4234b01fabbb3882ddbdeed6bf40b95a6ea6e57b614e3579b719b75d8a269ce7182a26c713aff0cfa4cb71a0041595ae6c5399bb6b9005d465b897c6390939f06fe71abb8b08479d2d37616206afffbff6819a4edb316c448bd4e5a371e47e9edb176a15cbf647e97ed257da87d66c38ff9108674180d95fb9becb6308acf4f482effc28c00cac39c26b29c18046fef2fba11bfe62b827421a6cb9b069d8815a9a96c24e56dbbae11d3d882f92d2f7b5a5ea9e159deb49f12a6e776e6c124e7f725ff6290b7d43494ecb1112960f7be4c881fa25dc219a57ebac5573358cc3c0659257bfcf546938cdcfeff13b3eb319077e02d467b6012230f370ba39eb66ccf65eeb5ee04939feaa5ddccb70fc',
     'http://zhidao.baidu.com/question/125848628.html', True),
    ('http://www.baidu.com/link?url=fbce9f46ec20241b726bf517f181a79495e3c292650eaeee65c99e84fca54c7c3d08b4bb69c1a2887efa4b8d35a4da4f03af035cf67889a3a450fdf80e495e5c9d727ecec7f7bb87ec3071b4d9a8f302775902476983ac7bae675a45a1bac57cdd5e5e22071cd29fe815deefdb4740c62eb424a888e09b285e1b4ece45a651aefb57e01d2bc95e71af06a0a63596d8b4ad8bad40a60132a5e3615a4c7a3db72bc801d02e83e71e2414d30bfec6fea7c52bb6034ccec63a5380e36bf31df97fb5b89b2c100cdc4af80de58a0d529f707d684e03bdfaf9b7b98148c47a7977dda9f7ca7dea7688cd1c2b508ff851ec21db1d8693c93b39e7932b64039bc513b89384714abd849dc6dbbb21870bbe339e6b68c39b12f7e7ebb703c47ae13650422ca9b539838e51de97825140d1a9ef170b982e9efefab4a1bf900e90e401f53f642171600a4160744df92a462544780796430c891a71e7df87e3379525936aebac5573358cc3c0659257bfcf546427d385fdf16629bd5e0d6a41d227',
     'http://www.sosuo.name/', True),
]

GOOGLE_CASES = [
    ('http://www.google.com.hk/url?sa=t&rct=j&q=%E9%B2%9C%E8%8A%B1&source=web&cd=1&ved=0CGUQFjAA&url=http%3A%2F%2Fwww.malatown.com.cn%2F&ei=XE19T4KuEOayiQfbiJGfCQ&usg=AFQjCNHKOvUFnBDlhxrXmClax278cQ5f7w&cad=rja',
     'http://www.malatown.com.cn/', 'http://www.malatown.com.cn/', True),
    ('http://www.google.com.hk/url?sa=t&rct=j&q=%E4%BA%AC%E4%B8%9C&source=web&cd=1&ved=0CCgQFjAA&url=http%3A%2F%2Fwww.360buy.com%2F&ei=Al59T5e0CYa0iQf5nPjACQ&usg=AFQjCNGWezPzLUJN0DTo3PlVWXHMn2ZdDQ&cad=rja',
     'http://www.360buy.com/', 'http://www.360buy.com/', True),
    ('http://www.google.com.hk/aclk?sa=l&ai=C704h0l19T5q6I4SoiQfZ1byvBOr79JICtoqK5AOOxJiWBAgAEAEoA1DS_oHI_P____8BYJ250IGQBaABqrn2_QPIAQGpApxLraVeRYU-qgQUT9BD6PkitF094nmNEX_M3g5WrGk&sig=AOD64_26k5IXCr5jfWGFHQwG0LcPADlExQ&ved=0CAsQ0Qw&adurl=http://www.flowercn.com/%3Fsid%3Dggxh1&rct=j&q=%E9%B2%9C%E8%8A%B1&c',
     'http://www.google.com.hk/aclk?sa=l&ai=C704h0l19T5q6I4SoiQfZ1byvBOr79JICtoqK5AOOxJiWBAgAEAEoA1DS_oHI_P____8BYJ250IGQBaABqrn2_QPIAQGpApxLraVeRYU-qgQUT9BD6PkitF094nmNEX_M3g5WrGk&sig=AOD64_26k5IXCr5jfWGFHQwG0LcPADlExQ&ved=0CAsQ0Qw&adurl=http://www.flowercn.com/%3Fsid%3Dggxh1&rct=j&q=%E9%B2%9C%E8%8A%B1&c', '', False),
    ('http://www.google.com/',
     'http://www.google.com/', '', False),
    ('http://www.google.com.hk/url?sa=t&rct=j&q=%CA%AE%C1%EA%D5%F2%D7%E2%B7%BF%D0%C5%CF%A2&source=web&cd=2&ved=0CEIQFjAB&url=http%3A%2F%2Fcd.58.com%2Fshilingzhen%2Fzufang%2F&ei=rbsrT8aiJvGZiQfl4tG-Dg&usg=AFQjCNHbkQg7DeJDa-5uB1RjAheEkjOy_Q',
     'http://cd.58.com/shilingzhen/zufang/', 'http://cd.58.com/shilingzhen/zufang/', True),
    ('http://www.google.co.jp/url?sa=t&rct=j&q=ycbook&source=web&cd=1&ved=0CCgQFjAA&url=http%3A%2F%2Fwww.ycbook.com.cn%2F&ei=yGt-T7i4IeSUiAed4M2nBA&usg=AFQjCNHrarA4sZMh7g6Do8qM221KzJ0OgQ',
     'http://www.ycbook.com.cn/', 'http://www.ycbook.com.cn/', True),
    ('http://www.google.com.hk/url?q=http://www.bjgcsoft.com/&sa=U&ei=ScpFT-PKAeKSiAfG5ICZAw&ved=0CC4QFjAG&usg=AFQjCNFS9djCov-NrPfu5QSpr8R2RtdqSA',
     'http://www.bjgcsoft.com/', 'http://www.bjgcsoft.com/', True),
    ('http://www.google.com.hk/url?url=http://www.aipai.com/c5/Pzk2JScnImgnaiQg.html&rct=j&sa=X&ei=Z69PT-SBD_GciAfo4q3YCw&ved=0CDMQuAIwAA&q=%E7%A9%BF%E8%B6%8A%E7%81%AB%E7%BA%BF%E5%85%B3%E4%BA%8EAK%E5%8E%8B%E6%9E%AA%E7%9A%84%E8%A7%86%E9%A2%91&usg=AFQjCNHjz-BBZ5DwRfeu2Lewdp3HWAsE5g',
     'http://www.aipai.com/c5/Pzk2JScnImgnaiQg.html', 'http://www.aipai.com/c5/Pzk2JScnImgnaiQg.html', True),
    ('http://www.google.com.hk/url?q=http://www.7k7k.com/&sa=U&ei=-9P6T5W5K6m5iAeJpLDVBg&ved=0CBQQFjAA&usg=AFQjCNEXgy-9ZVXrDcppdkso6ddu3QuA8A',
     'http://www.7k7k.com/', 'http://www.7k7k.com/', True),
]


def test_baidu_reference_gtest_cases():
    for url, target, ok in BAIDU_CASES:
        got = parse_baidu_target_url(url)
        if ok:
            assert got == target, url[:60]
        else:
            assert got is None, url[:60]


def test_google_reference_gtest_cases():
    for url, target, parse_target, ok in GOOGLE_CASES:
        got = parse_google_target_url(url)
        if ok:
            assert got == parse_target, url[:60]
        else:
            assert got is None, url[:60]
        # the total wrapper column: parsed target or original url
        assert google_target_url(url) == target, url[:60]


def test_crack_roundtrip_and_branches():
    """Symmetric-XOR roundtrip: encrypting a known target with the
    method1 key + magic layout must decode back, including the
    <=32 -> %xx re-escape branch."""
    from spider_ray.kernels.targeturl import (
        _METHOD1,
        _parse_hex,
        parse_baidu_target_url,
    )

    key, _, key_idx, magic_pos, magic = _METHOD1
    target = "http://t3.example.org/a b/p7"  # space hits the %xx branch

    def encrypt(t):
        hx = "0123456789abcdef"
        out = []
        for i, ch in enumerate(t):
            num = ord(ch)
            out.append(hx[(num >> 4) ^ _parse_hex(key[2 * i])])
            out.append(hx[(num & 15) ^ _parse_hex(key[2 * i + 1])])
        return "".join(out)

    url = (
        "http://www.baidu.com/link?url="
        + "ab" * 16  # filler to offset 62, != magic
        + magic
        + encrypt(target)
    )
    assert len("http://www.baidu.com/link?url=" + "ab" * 16) == magic_pos
    got = parse_baidu_target_url(url)
    assert got == "http://t3.example.org/a%20b/p7"
    # odd-length payload fails
    assert parse_baidu_target_url(url + "0") is None
    # passthrough for non-link urls
    assert parse_baidu_target_url("http://x.example/a") == (
        "http://x.example/a"
    )
    # invalid url rejected outright
    assert parse_baidu_target_url("notaurl") is None


def test_target_url_extract_matches_oracle(ray_session):
    import duckdb
    import polars as pl

    import __ray_entry__ as E
    from spider_ray.functions.loganalysis import q_target_url_extract
    from tests.test_relational import _normalize

    sf = "/root/testdata/sf0.001"
    ours = _normalize(pl.from_arrow(q_target_url_extract(sf)).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    theirs = _normalize(con.sql(E.oracle_sql()["target_url_extract"]).df())
    assert ours.shape == theirs.shape
    assert (ours.values == theirs.values).all()
    # every live mode appears; fail rows exist (mode 4)
    assert (ours["ok"] == 0).any() and (ours["ok"] == 1).any()
    assert set(ours["engine"]) == {"baidu", "google"}
    # the %xx re-escape branch is exercised
    assert ours["target_url"].str.contains("%20").any()
